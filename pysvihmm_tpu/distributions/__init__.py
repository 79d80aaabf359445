"""Conjugate exponential-family distributions (replaces pybasicbayes — SURVEY.md §2.2)."""
from . import diag_gaussian, dirichlet, niw
from .diag_gaussian import NIG, DiagGaussianStats
from .emissions import DiagonalGaussianNIG, GaussianNIW, MultinomialDirichlet
from .niw import NIW, GaussianStats
