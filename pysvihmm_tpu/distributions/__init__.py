"""Conjugate exponential-family distributions (replaces pybasicbayes — SURVEY.md §2.2)."""
from . import diag_gaussian, dirichlet, niw, poisson
from .diag_gaussian import NIG, DiagGaussianStats
from .emissions import (
    DiagonalGaussianNIG,
    GaussianNIW,
    MultinomialDirichlet,
    PoissonGamma,
)
from .niw import NIW, GaussianStats
from .poisson import GammaP, PoissonStats
