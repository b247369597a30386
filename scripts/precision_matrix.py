"""Precision x parity matrix: for each selectively-downgraded matmul
precision variant, run the golden-vs-pallas parity check (verify_chip) on
the REAL chip.  Picks which matmuls actually need multi-pass precision —
each [P,G] pass costs real milliseconds (all-precise measured +4.4 ms/step
over all-default at the bench config)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from mini3dgs_tpu.ops import raster_pallas as R
from verify_chip import parity

_dims_u = (((0,), (0,)), ((), ()))
_dims_row = (((1,), (0,)), ((), ()))
_dims_acc = (((1,), (1,)), ((), ()))


def _dot_default(a, b, dims):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _prefix_default(x, strict):
    G = x.shape[-1]
    B = min(R.PREFIX_BLOCK, G)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tri = ((ii < jj) if strict else (ii <= jj)).astype(jnp.float32)
    outs, carry = [], None
    for b in range(G // B):
        xb = x[:, b * B:(b + 1) * B]
        pre = _dot_default(xb, tri, _dims_row)
        if carry is not None:
            pre = pre + carry
        outs.append(pre)
        carry = pre[:, -1:] + (xb[:, -1:] if strict else 0.0)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _u_default(gout, cmat):
    return _dot_default(gout, cmat, _dims_u)


def _moments_default(gout, Mpix, ones_row, wgt, d_lw, d_op_pix):
    return (_dot_default(gout, wgt, _dims_row),
            _dot_default(Mpix, d_lw, _dims_row),
            _dot_default(ones_row, d_op_pix, _dims_row))


def _acc_default(cmat, contrib):
    return _dot_default(cmat, contrib, _dims_acc)


VARIANTS = [
    ("all precise (production)", {}),
    ("acc default", {"_acc_matmul": _acc_default}),
    ("u default", {"_u_matmul": _u_default}),
    ("moments default", {"_bwd_moments": _moments_default}),
    ("prefix default", {"_prefix_blocked": _prefix_default}),
    ("all default", {"_acc_matmul": _acc_default, "_u_matmul": _u_default,
                     "_bwd_moments": _moments_default,
                     "_prefix_blocked": _prefix_default}),
]


def main():
    saved = {}
    for name, patches in VARIANTS:
        print(f"=== {name} ===", flush=True)
        for attr, fn in patches.items():
            saved[attr] = getattr(R, attr)
            setattr(R, attr, fn)
        R._make_raster_op.cache_clear()
        try:
            parity()
        finally:
            for attr in patches:
                setattr(R, attr, saved[attr])


if __name__ == "__main__":
    main()
