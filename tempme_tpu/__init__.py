"""tempme_tpu: a TPU-native temporal-GNN + motif-explainer framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the TempME
reference (dharunm236/TempME): TGAT/TGN/GraphMixer base models for future link
prediction on continuous-time event streams, on-device temporal neighbor and
motif-walk sampling, the TempME explainer (motif importance -> edge importance,
fidelity/sparsity evaluation), and an enhance stage -- plus SPMD distribution
over jax.sharding meshes, which the reference lacks entirely.
"""
from .config import Config, DataConfig, ModelConfig, SamplerConfig, ExplainerConfig

__version__ = "0.1.0"
