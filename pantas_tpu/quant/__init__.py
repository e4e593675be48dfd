"""PSI / ΔPSI quantification across replicates and conditions."""

from pantas_tpu.quant.quantify import quantify  # noqa: F401
