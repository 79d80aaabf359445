"""Conjugate exponential-family distributions (replaces pybasicbayes — SURVEY.md §2.2)."""
from . import dirichlet, niw
from .emissions import GaussianNIW, MultinomialDirichlet
from .niw import NIW, GaussianStats
