"""Platform helpers."""

from __future__ import annotations

__all__ = ["is_tpu", "maybe_enable_pallas"]


def is_tpu() -> bool:
    import jax
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return "tpu" in dev.platform.lower() or "TPU" in dev.device_kind


def maybe_enable_pallas(cfg):
    """Return cfg with the Pallas kernels enabled when running on TPU
    (ReLU models only; other activations keep the XLA path)."""
    from dataclasses import replace
    if is_tpu() and cfg.activation == "ReLU" and not cfg.use_pallas:
        return replace(cfg, use_pallas=True)
    return cfg
