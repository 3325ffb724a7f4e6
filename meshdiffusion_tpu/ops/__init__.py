"""Compute ops: Pallas TPU kernels + their jnp oracles.

Organization follows the reference's renderutils pattern (every native
kernel ships with a pure python golden implementation selected by
``use_pallas=``, reference renderutils/ops.py:103-111): the jnp oracle is
the spec, the Pallas kernel is the fast path, tests assert equivalence.

Most of MeshDiffusion's elementwise math fuses optimally under plain XLA
(measured: bf16 vs fp32 U-Net deltas are noise — the model is conv-bound),
so Pallas is reserved for ops where manual control wins: the fused sampler
step (one HBM round trip for the whole ancestral update) and the grouped
normalization used at every residual block.
"""

from .sampler_step import ancestral_update, ancestral_update_reference  # noqa: F401
from .groupnorm import fused_groupnorm_silu, groupnorm_silu_reference  # noqa: F401
from .gn_silu_conv import gn_silu_conv3d, gn_silu_conv3d_reference  # noqa: F401
