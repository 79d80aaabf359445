"""Inference engines (reference L2 — SURVEY.md §1): one module per reference
engine plus the Gibbs comparison sampler.

  batch_vb   <- pysvihmm/hmmbatchcd.py   (coordinate-ascent VB)
  batch_sgd  <- pysvihmm/hmmbatchsgd.py  (full-data natural-gradient VB)
  svi        <- pysvihmm/hmmsvi.py       (SVI over buffered subchains)
  metaobs    <- pysvihmm/hmmsgd_metaobs.py (parallel meta-observation SVI)
  gibbs      — FFBS blocked Gibbs ("Gibbs-style comparisons", BASELINE.json)
"""
from . import base, batch_sgd, batch_vb, gibbs, metaobs, svi
