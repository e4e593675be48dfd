"""Coverage augmentation engine (the reference's `augment` stage).

Split into:

* :mod:`pantas_tpu.coverage.semantics` — per-read walk distribution: GAF
  record -> (surviving nodes, IL/OL offset events, edge events). The exact
  behavioral contract of the reference augmenter
  (``scripts/alignments_augmentation_from_gaf.py``).
* :mod:`pantas_tpu.coverage.host` — stream-order dict accumulator producing
  byte-identical augmented GFA (insertion-order preserving).
* :mod:`pantas_tpu.coverage.device` — jit/shard_map scatter-add accumulator
  over compiled graph tensors, partial sums merged with psum; the host
  tracker keeps first-seen orders so emission stays byte-identical.
"""

from pantas_tpu.coverage.host import augment_gfa  # noqa: F401
