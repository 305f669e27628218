"""TPU-native histograms for the information metrics (EN/CE/MI).

Scatter-add (`zeros.at[idx].add(1)`) lowers to a sort-based scatter on TPU —
slow and serial for the ~1.25M updates of a full-res image. Instead both the
256-bin and the 256x256 joint histogram are computed as **one-hot matmuls**
on the MXU:

    hist(img)        = 1^T @ onehot(img)            (column sums)
    joint(img1,img2) = onehot(img1)^T @ onehot(img2)

One-hot entries are exactly 0/1 and accumulation is f32, so counts are exact
(up to 2^24 pixels per block; blocks are 512x smaller). `lax.scan` over
pixel blocks bounds the one-hot working set to a few MB of VMEM-friendly
tiles.
"""

import jax
import jax.numpy as jnp

_BLOCK = 1 << 16  # 65536 pixels per scan step


def _pad_to_block(idx, fill):
    n = idx.shape[0]
    pad = (-n) % _BLOCK
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), fill, idx.dtype)])
    return idx, n, pad


def histogram256(img):
    """Counts of floor(img) clipped to [0, 255] (torch.histc(256, 0, 256)
    semantics for in-range data)."""
    idx = jnp.clip(img.astype(jnp.int32), 0, 255).reshape(-1)
    idx, n, pad = _pad_to_block(idx, 0)
    blocks = idx.reshape(-1, _BLOCK)

    def step(acc, blk):
        onehot = (blk[:, None] == jnp.arange(256)[None, :]).astype(
            jnp.bfloat16)
        return acc + jnp.sum(onehot.astype(jnp.float32), axis=0), None

    acc, _ = jax.lax.scan(step, jnp.zeros((256,), jnp.float32), blocks)
    if pad:
        acc = acc.at[0].add(-float(pad))
    return acc


def joint_histogram256(img1, img2):
    """256x256 joint histogram (np.histogram2d semantics) via per-block
    onehot1^T @ onehot2 on the MXU."""
    i1 = jnp.clip(img1.astype(jnp.int32), 0, 255).reshape(-1)
    i2 = jnp.clip(img2.astype(jnp.int32), 0, 255).reshape(-1)
    i1, n, pad = _pad_to_block(i1, 0)
    i2, _, _ = _pad_to_block(i2, 0)
    b1 = i1.reshape(-1, _BLOCK)
    b2 = i2.reshape(-1, _BLOCK)

    bins = jnp.arange(256)

    def step(acc, blks):
        a, b = blks
        oh1 = (a[:, None] == bins[None, :]).astype(jnp.bfloat16)
        oh2 = (b[:, None] == bins[None, :]).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            oh1, oh2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + contrib, None

    acc, _ = jax.lax.scan(step, jnp.zeros((256, 256), jnp.float32),
                          (b1, b2))
    if pad:
        acc = acc.at[0, 0].add(-float(pad))
    return acc
