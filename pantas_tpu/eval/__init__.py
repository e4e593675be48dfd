"""Evaluation harness: AS-event simulation with ground truth + accuracy scoring.

Native replacement for the reference's simulation experiment machinery
(``exps/1-dm-sim``: ASimulatoR + truth builders + ``cmp_pantas.py``):

* :mod:`simulate` — generate alternative-splicing isoforms (ES/IR/A3/A5)
  from the annotation, simulate reads from them, and emit a truth table in
  linear coordinates,
* :mod:`compare` — match called events (quant-remap CSV) against truth with
  coordinate tolerance; precision/recall/F1 per event type.
"""
