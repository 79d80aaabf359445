"""Unified configuration (SURVEY.md §5: the reference has none — constructor
kwargs + hardcoded script constants; we provide one dataclass config tree
with CLI binding for the experiment scripts)."""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    K: int = 4  # hidden states
    emission: str = "gaussian"  # "gaussian" | "diag_gaussian" | "multinomial" | "poisson"
    obs_dim: int = 2  # D (gaussian)
    num_symbols: int = 32  # V (multinomial)
    alpha_init: float = 1.0  # Dirichlet prior on pi
    alpha_tran: float = 1.0  # Dirichlet prior on A rows
    niw_kappa: float = 1.0
    niw_nu: float | None = None  # default D + 2
    niw_psi_scale: float = 1.0


@dataclass
class SVIHyperConfig:
    batch_size: int = 32
    subchain_len: int = 50
    buffer: int = 10
    tau: float = 1.0
    kappa: float = 0.6
    adaptive: bool = False  # elastic step-size adaptation


@dataclass
class RunConfig:
    engine: str = "batch_vb"  # batch_vb | batch_sgd | svi | metaobs | gibbs
    num_iters: int = 100
    method: str = "auto"  # e-step kernel: auto | pallas | scan | assoc | grad
    seed: int = 0
    mesh_devices: int = 0  # 0 = all
    checkpoint_dir: str = ""
    checkpoint_every: int = 0
    log_every: int = 10
    log_path: str = ""  # JSONL metrics file (echoes to stderr regardless)
    dtype: str = "float32"
    # Held-out predictive-log-likelihood tracking (the reference paper's
    # pred-LL-vs-wall-clock figures): every N iterations, pause the fit and
    # score `holdout_seqs` held-out sequences (split from the SAME synthetic
    # dataset). 0 disables (single uninterrupted compiled fit).
    pred_ll_every: int = 0
    holdout_seqs: int = 8
    # NaN debugging (SURVEY.md §5 sanitizers row): when true the runner
    # flips jax_debug_nans on, so the first non-finite intermediate raises
    # at its producing op (with a de-optimized re-run pinpointing it)
    # instead of surfacing later through the trainer watchdog.
    debug_nans: bool = False


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    svi: SVIHyperConfig = field(default_factory=SVIHyperConfig)
    run: RunConfig = field(default_factory=RunConfig)


def _add_dataclass_args(parser: argparse.ArgumentParser, dc, prefix: str) -> None:
    for f in dataclasses.fields(dc):
        arg = f"--{prefix}{f.name.replace('_', '-')}"
        default = getattr(dc, f.name)
        if isinstance(default, bool):
            parser.add_argument(arg, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=default)
        elif default is None:
            parser.add_argument(arg, type=float, default=None)
        else:
            parser.add_argument(arg, type=type(default), default=default)


def parse_config(argv: list[str] | None = None) -> Config:
    """Build a Config from CLI flags (--k, --svi-batch-size, --engine, ...)."""
    cfg = Config()
    parser = argparse.ArgumentParser(description="pysvihmm_tpu runner")
    _add_dataclass_args(parser, cfg.model, "")
    _add_dataclass_args(parser, cfg.svi, "svi-")
    _add_dataclass_args(parser, cfg.run, "")
    ns = parser.parse_args(argv)
    for f in dataclasses.fields(cfg.model):
        setattr(cfg.model, f.name, getattr(ns, f.name))
    for f in dataclasses.fields(cfg.svi):
        setattr(cfg.svi, f.name, getattr(ns, f"svi_{f.name}"))
    for f in dataclasses.fields(cfg.run):
        setattr(cfg.run, f.name, getattr(ns, f.name))
    return cfg
