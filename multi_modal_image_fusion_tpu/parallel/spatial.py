"""Spatial (height) sharding: one full-resolution pair across many chips.

The reference's only parallel axis is the batch (single-node NCCL DDP,
reference common.py:96-113); images larger than one GPU's appetite are
handled by cropping (train.py:192-201). This module adds the axis the
reference never had — the vision analogue of sequence parallelism: shard
the IMAGE's height over a device mesh and fuse one full-res pair with
all chips cooperating. Useful when latency on a single pair matters
(batch-DP cannot shrink it) or when a gigapixel input exceeds one chip's
HBM.

Design (receptive-field halo, one exchange total):

- Every conv in the eligible models is stride-1 with reflect-'SAME'
  padding (reference block.py:26-99), and every fusion op they use is
  per-pixel local, so output rows [a, b) depend on input rows
  [a - R, b + R) only, where R = sum over the conv stack of (kh // 2).
  R is derived from the parameter tree (`receptive_halo`) as a safe
  upper bound: summing over ALL kernels over-counts parallel branches,
  which only widens the slab (more overlap compute), never breaks
  exactness.
- Each device owns S = H / n rows and receives R context rows from each
  neighbor via one `lax.ppermute` pair up front — ICI neighbor traffic,
  no host gathers, no per-layer communication.
- The model then runs UNMODIFIED on the local slab. At slab edges that
  are true image boundaries its reflect padding is semantically correct;
  at interior slab edges the padding reads wrong rows, but the
  contamination penetrates at most R rows — exactly the overlap being
  discarded. Three static variants (top / middle / bottom slab) under
  `lax.switch` keep the true-boundary reflect exact; outputs crop back
  to the owned S rows, so the sharded result is numerically IDENTICAL to
  the single-device forward (tests/test_spatial.py asserts equality).

Eligibility: whole-forward stride-1 models whose fusion is per-pixel
local — deepfuse, densefuse (sum/mean/max/l1), vifnet, pfnetv1, pfnetv2,
ifcnn, difnet, pmgi. Multi-scale models (pool/stride transitions change
the halo geometry per level) and global fusion ('nl' attention, nuclear
pooling) are rejected loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .mesh import make_mesh

# Models whose forward is a stride-1 conv stack with per-pixel-local
# fusion (see module docstring). Keys match models.create_model.
SPATIAL_ELIGIBLE = ("deepfuse", "densefuse", "vifnet", "pfnetv1",
                    "pfnetv2", "ifcnn", "difnet", "pmgi")

# Fusion modes that reduce over the full spatial extent (reference
# fusion.py:97-150); a model configured with one cannot be height-sharded
# exactly. (The eligible models' defaults — sum/mean/max/l1/concat and
# the learned 1x1 fusers — are all per-pixel local.)
_GLOBAL_FUSION_MODES = ("nl", "nuclear")


def receptive_halo(variables):
    """Upper bound on the forward's receptive-field halo, in rows.

    Sums (kh // 2) over every 4-D conv kernel in the parameter tree.
    Exact for a sequential stride-1 stack; an over-estimate when blocks
    branch (dense blocks, unshared siamese encoders), which costs
    overlap compute but preserves exactness.
    """
    halo = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        if getattr(leaf, "ndim", 0) == 4:
            name = str(path[-1])
            if "kernel" in name:
                halo += int(leaf.shape[0]) // 2
    return halo


def check_spatial_eligible(model_name, fusion_mode=None):
    name = model_name.lower()
    if name not in SPATIAL_ELIGIBLE:
        raise ValueError(
            f"model '{model_name}' cannot be height-sharded exactly: "
            f"only stride-1 local-fusion models qualify "
            f"({', '.join(SPATIAL_ELIGIBLE)}); multi-scale transitions "
            f"and global fusion change the halo geometry")
    if fusion_mode in _GLOBAL_FUSION_MODES:
        raise ValueError(
            f"fusion mode '{fusion_mode}' reduces over the full image "
            f"and cannot be height-sharded exactly")


def spatial_forward(model, variables, img1, img2, mesh=None,
                    axis_name="data", halo=None, train=False):
    """Fused forward of one (batch of) pair(s), height-sharded over the
    mesh. Returns the same values as `model.apply(variables, img1, img2,
    train=train)` — bit-comparable, see tests/test_spatial.py.

    img1/img2: (B, H, W, C) with H divisible by the mesh size and
    H / n >= halo (each device's context comes from its immediate
    neighbor only).

    train=True is differentiable end-to-end (shard_map transposes the
    ppermute exchange automatically) and exact for norm-free models;
    batch-stat-bearing models are rejected (their stats would reduce
    per-shard).
    """
    if train and variables.get("batch_stats"):
        raise ValueError(
            "spatial training is exact only for norm-free models: "
            "batch statistics would reduce over each height shard "
            "instead of the global extent")
    if mesh is None:
        mesh = make_mesh()
    n = int(np.prod(mesh.shape[axis_name]))
    if n == 1:
        return model.apply(variables, img1, img2, train=train)

    _, h, _, _ = img1.shape
    if h % n:
        raise ValueError(f"H={h} not divisible by mesh size {n}; pad the "
                         f"input (cli pad_bucket) or use fewer devices")
    s = h // n
    r = receptive_halo(variables) if halo is None else int(halo)
    if s < r:
        raise ValueError(
            f"shard height {s} < receptive halo {r}: context would span "
            f"non-neighbor devices; use fewer devices for H={h}")

    up_perm = [(i, i + 1) for i in range(n - 1)]    # ctx from device above
    down_perm = [(i + 1, i) for i in range(n - 1)]  # ctx from device below

    def exchange(blk):
        top_ctx = jax.lax.ppermute(blk[:, -r:], axis_name, up_perm)
        bot_ctx = jax.lax.ppermute(blk[:, :r], axis_name, down_perm)
        return jnp.concatenate([top_ctx, blk, bot_ctx], axis=1)

    def local(v, b1, b2):
        s1, s2 = exchange(b1), exchange(b2)  # (B, S + 2R, W, C)
        idx = jax.lax.axis_index(axis_name)

        # Three static slab variants so reflect padding acts on true
        # image boundaries only; ppermute's zero-fill for the missing
        # neighbor lands in the rows each variant slices away.
        def top(a1, a2):
            return model.apply(v, a1[:, r:], a2[:, r:],
                               train=train)[:, :s]

        def mid(a1, a2):
            return model.apply(v, a1, a2, train=train)[:, r:r + s]

        def bot(a1, a2):
            return model.apply(v, a1[:, :s + r], a2[:, :s + r],
                               train=train)[:, r:r + s]

        branch = jnp.where(idx == 0, 0, jnp.where(idx == n - 1, 2, 1))
        return jax.lax.switch(branch, (top, mid, bot), s1, s2)

    shard = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis_name), P(None, axis_name)),
        out_specs=P(None, axis_name), check_vma=False)
    return shard(variables, img1, img2)
