"""Model family: CGR / CGR-MPNN-3D directed-bond message passing networks."""

from .cgr_mpnn import ACTIVATIONS, CGRMPNNConfig, apply, init_params

__all__ = ["ACTIVATIONS", "CGRMPNNConfig", "apply", "init_params"]
