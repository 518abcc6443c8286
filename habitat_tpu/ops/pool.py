"""Max-pool 3x3 stride-2 with a Pallas TPU backward kernel.

STATUS: measured NEGATIVE at the headline-bench minibatch and therefore NOT
wired into models/resnet.py (which keeps XLA's select-and-scatter VJP).
Isolated fwd+bwd at (4096,64,64,32) bf16 on v5e: XLA 10.5 ms, this kernel
13.9 ms, gather-form fallback 34 ms; full train step 619 vs 594 ms. The
kernel body itself is fine — the loss is the (B,H,W,C)<->(H,W,C,B)
transposes around it, which XLA materializes as real HBM copies in the
train step's layout. Kept (with tests/test_pool.py) as the record of the
experiment and for any future caller already holding batch-minor layouts.

The design: XLA lowers max-pool's VJP to `select-and-scatter`, which runs
essentially scalarized on TPU. The backward pass here is a Pallas kernel
built entirely from leading-dimension slices (no sublane/lane shifts, which
Mosaic relayouts at catastrophic cost — see PROGRESS.md round-2 session-3
negative results):

  - arrays are processed as (H, W, C, B): batch in lanes, channels in
    sublanes, both spatial dims leading. XLA's own conv layouts on this
    model are batch-minor ({0,3,2,1}), so the logical transpose in/out of
    the kernel is a layout no-op in the common case.
  - window coverage for stride 2 / window 3 / SAME (pad high only):
    input row h is covered by output rows {h//2-1+p, h//2} — at most 2 —
    and the same in columns, so each input pixel sums <=4 masked window
    gradients:  gx[p] = sum_w dy[w] * (x[p] == y[w]).
  - the even/odd column interleave is a leading-dim reshape; the two
    window-row alignments are passed as two pre-shifted views (ya/yb) so
    every in-kernel index is a static contiguous leading-dim slice.

Ties: every input equal to the window max receives the window's gradient
(XLA credits only the first in scan order). Gradients differ only on exact
float ties inside a 3x3 window — measure-zero for continuous activations
and irrelevant for training.

Reference counterpart: torch MaxPool2d inside the reference's ResNet stem
(habitat-baselines/habitat_baselines/rl/ddppo/policy/resnet.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl


def _xla_maxpool(x):
    # init must be a weak-typed scalar: a concrete bf16 *array* here breaks
    # linearization under fori_loop partial-eval ("unknown output primals")
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )


def _bwd_kernel(hb: int, x_ref, ya_ref, yb_ref, da_ref, db_ref, gx_ref):
    """One (hb, W, Cb, Bb) block of gx.

    ya/da blocks hold padded window rows [m0, m0+hb/2); yb/db hold
    [m0+1, m0+hb/2+1) — together every window row any x row in the block
    needs. All slicing below is static and on leading dims only.
    """
    w = x_ref.shape[1]
    wo = w // 2
    hh = hb // 2
    tail = x_ref.shape[2:]
    # v5e Mosaic rejects sub-32-bit equality compares ("Target does not
    # support this comparison") — compare in f32; casts are exact
    cmp = jnp.float32
    # all rows at once, split by (row parity, col parity); every split/merge
    # is a leading-dim reshape, every tap a static leading-dim slice
    xq = x_ref[:].reshape(hh, 2, wo, 2, *tail).astype(cmp)
    x_ee, x_eo = xq[:, 0, :, 0], xq[:, 0, :, 1]  # even rows
    x_oe, x_oo = xq[:, 1, :, 0], xq[:, 1, :, 1]  # odd rows
    ya, da = ya_ref[:].astype(cmp), da_ref[:]  # window rows {m-1}
    yb, db = yb_ref[:].astype(cmp), db_ref[:]  # window rows {m}
    zero = jnp.zeros((hh, wo, *tail), x_ref.dtype)
    acc_ee, acc_eo, acc_oe, acc_oo = zero, zero, zero, zero
    # even input rows see window rows {m-1, m} (ya/yb); odd rows {m} (yb)
    for yv, dv, row_par in ((ya, da, 0), (yb, db, 0), (yb, db, 1)):
        for k in (0, 1):  # even cols: window cols {n-1, n}
            m = jnp.where((x_ee if row_par == 0 else x_oe) == yv[:, k : wo + k],
                          dv[:, k : wo + k], 0)
            if row_par == 0:
                acc_ee += m
            else:
                acc_oe += m
        mo = jnp.where((x_eo if row_par == 0 else x_oo) == yv[:, 1 : wo + 1],
                       dv[:, 1 : wo + 1], 0)  # odd cols: window col {n}
        if row_par == 0:
            acc_eo += mo
        else:
            acc_oo += mo
    row_e = jnp.stack([acc_ee, acc_eo], axis=2)  # (hh, Wo, 2, Cb, Bb)
    row_o = jnp.stack([acc_oe, acc_oo], axis=2)
    gx_ref[:] = jnp.stack([row_e, row_o], axis=1).reshape(x_ref.shape)


def _bwd_pallas(x, y, dy, interpret=False):
    b, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    # transpose to (H, W, C, B); with XLA's batch-minor conv layouts this is
    # a relabeling, not a copy
    xt = jnp.transpose(x, (1, 2, 3, 0))
    yt = jnp.transpose(y, (1, 2, 3, 0))
    dt = jnp.transpose(dy, (1, 2, 3, 0))
    neg = jnp.array(-np.inf, y.dtype)
    yp = jnp.pad(yt, ((1, 1), (1, 1), (0, 0), (0, 0)), constant_values=neg)
    dp = jnp.pad(dt, ((1, 1), (1, 1), (0, 0), (0, 0)))
    ya, yb = yp[:-1], yp[1:]
    da, db = dp[:-1], dp[1:]

    hb = min(8, h)
    cb = c if c * np.dtype(x.dtype).itemsize <= 32 else 8
    bb = min(128, b)
    grid = (h // hb, c // cb, b // bb)
    spec_x = pl.BlockSpec((hb, w, cb, bb), lambda i, j, k: (i, 0, j, k))
    spec_y = pl.BlockSpec(
        (hb // 2, wo + 2, cb, bb), lambda i, j, k: (i, 0, j, k)
    )
    gx = pl.pallas_call(
        partial(_bwd_kernel, hb),
        grid=grid,
        in_specs=[spec_x, spec_y, spec_y, spec_y, spec_y],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct(xt.shape, x.dtype),
        interpret=interpret,
    )(xt, ya, yb, da, db)
    return jnp.transpose(gx, (3, 0, 1, 2))


def _supported(x) -> bool:
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    return (
        h % 32 == 0
        and w % 32 == 0
        and h == w
        and c % 8 == 0
        and b % 128 == 0
        and x.dtype in (jnp.bfloat16, jnp.float32)
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3x3s2(x, interpret=False):
    """3x3/2 SAME max pool; identical forward to nn.max_pool, Pallas VJP."""
    return _xla_maxpool(x)


def _fwd(x, interpret):
    y = _xla_maxpool(x)
    return y, (x, y)


def _on_tpu() -> bool:
    # same rule as ops/raycast._pick_backend: the tests pin
    # jax_default_device to CPU while the backend stays "tpu"
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return dev.platform == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _bwd_xla(x, y, dy):
    """Gather-form fallback with the same all-ties rule as the kernel:
    gx[p] = sum_off dy_up[p-off] * (x[p] == y_up[p-off]), off in {0,1,2}^2,
    where (y, dy) are dilated to input resolution at position 2*o (XLA SAME
    for window 3 / stride 2 / even H pads high only). Pure pad+slice taps —
    no select-and-scatter, no inner jax.vjp, so it composes with remat."""
    b, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    neg = jnp.array(-np.inf, y.dtype)

    def dilate(a, fill):
        z = jnp.full((b, ho, 2, wo, 2, c), fill, a.dtype)
        z = z.at[:, :, 0, :, 0, :].set(a)
        return z.reshape(b, 2 * ho, 2 * wo, c)[:, :h, :w]

    yp = jnp.pad(
        dilate(y, neg), ((0, 0), (2, 0), (2, 0), (0, 0)), constant_values=neg
    )
    dp = jnp.pad(dilate(dy, 0), ((0, 0), (2, 0), (2, 0), (0, 0)))
    gx = jnp.zeros_like(x)
    for a in range(3):
        for k in range(3):
            ys = yp[:, 2 - a : 2 - a + h, 2 - k : 2 - k + w]
            ds = dp[:, 2 - a : 2 - a + h, 2 - k : 2 - k + w]
            gx = gx + jnp.where(x == ys, ds, 0)
    return gx


def _bwd(interpret, res, dy):
    x, y = res
    if _supported(x) and (interpret or _on_tpu()):
        return (_bwd_pallas(x, y, dy, interpret=interpret),)
    return (_bwd_xla(x, y, dy),)


max_pool_3x3s2.defvjp(_fwd, _bwd)
