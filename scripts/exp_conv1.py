"""conv1 (7x7/2, C_in=4) reformulations — the update's worst kernel.

Ground truth (exp_truth.py, slope timing): XLA runs the bench encoder's
first conv at ~8.5 TF/s (4%_peak) because C_in=4 wastes 97% of the MXU's
contraction rows. Reformulations measured here:

  A. baseline lax.conv 7x7/2 NHWC C_in=4->32
  B. space-to-depth(2): x -> (B,64,64,16), conv 4x4/1 ->32 with explicit
     padding (2,1) — same math, K=256 contraction
  C. double space-to-depth: output tiled 2x2 too — conv 5x5/2 16->128 on the
     s2d input, output (B,32,32,128) = s2d of the true (B,64,64,32) output.
     K=400, N=128: MXU-shaped at both ends (the MLPerf-style transform).

B and C are verified against A to bf16 tolerance before timing.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from scripts._timing import chain_time


def s2d(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C); channel = (dy*2+dx)*C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def uns2d(y):
    """Inverse of s2d."""
    B, H2, W2, C4 = y.shape
    C = C4 // 4
    y = y.reshape(B, H2, W2, 2, 2, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H2 * 2, W2 * 2, C)


def conv1_weights_s2d(w):
    """(7,7,C,O) -> (4,4,4C,O) for the B variant.

    out(i,j,o) = sum_{u,v,c} w[u,v,c,o] x[2i+u-3, 2j+v-3, c].
    Row 2i+u-3 lives in s2d cell p = floor((2i+u-3)/2) = i + floor((u-3)/2)
    with parity dy = (u-3) mod 2; taps a = p-i+2 in 0..3 (explicit padding
    (2,1) aligns a=2 with p=i)."""
    k, _, C, O = w.shape
    w2 = np.zeros((4, 4, 4 * C, O), w.dtype)
    for u in range(k):
        a, dy = divmod(u - 3, 2)
        a += 2  # tap index
        for v in range(k):
            b, dx = divmod(v - 3, 2)
            b += 2
            w2[a, b, (dy * 2 + dx) * C : (dy * 2 + dx) * C + C, :] += w[u, v]
    return w2


def conv1_weights_s2d2(w):
    """(7,7,C,O) -> (5,5,4C,4O) for the C variant (output s2d too).

    out(2i+al, 2j+be, o) consumes input rows 2(i)+al+u-3; in s2d cells
    p = i + floor((al+u-3)/2), dy = (al+u-3) mod 2, taps p-i in {-2..1} for
    al in {0,1} -> 5 taps with padding (2,2); out channel = (al*2+be)*O+o."""
    k, _, C, O = w.shape
    w2 = np.zeros((5, 5, 4 * C, 4 * O), w.dtype)
    for al in range(2):
        for be in range(2):
            for u in range(k):
                a, dy = divmod(al + u - 3, 2)
                a += 2
                for v in range(k):
                    b, dx = divmod(be + v - 3, 2)
                    b += 2
                    w2[a, b, (dy * 2 + dx) * C : (dy * 2 + dx) * C + C,
                       (al * 2 + be) * O : (al * 2 + be) * O + O] += w[u, v]
    return w2


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/habitat_tpu_jax_cache")
    rng = np.random.default_rng(0)
    B = 4096
    C, O = 4, 32
    xs = rng.normal(size=(8, 128, 128, C)).astype(np.float32)
    wn = (rng.normal(size=(7, 7, C, O)) * 0.05).astype(np.float32)

    def conv_a(x, w):
        return lax.conv_general_dilated(
            x, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    def conv_b(x, w2):
        y = lax.conv_general_dilated(
            s2d(x), w2, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y

    def conv_c(x, w2):
        y = lax.conv_general_dilated(
            s2d(x), w2, (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return uns2d(y)

    # numerics (f32, small batch, on-device)
    a = np.asarray(jax.jit(conv_a)(jnp.asarray(xs), jnp.asarray(wn)))
    b = np.asarray(jax.jit(conv_b)(jnp.asarray(xs), jnp.asarray(conv1_weights_s2d(wn))))
    c = np.asarray(jax.jit(conv_c)(jnp.asarray(xs), jnp.asarray(conv1_weights_s2d2(wn))))
    print("B max err:", np.abs(a - b).max(), " C max err:", np.abs(a - c).max(),
          flush=True)

    # timing (bf16, slope)
    x = jnp.asarray(rng.normal(size=(B, 128, 128, C)), jnp.bfloat16)
    wb = jnp.asarray(wn, jnp.bfloat16)
    w2b = jnp.asarray(conv1_weights_s2d(wn), jnp.bfloat16)
    w3b = jnp.asarray(conv1_weights_s2d2(wn), jnp.bfloat16)
    gf = 2 * 64 * 64 * O * 49 * C * B / 1e9

    def mk(convfn, w):
        def step(x):
            y = convfn(x.astype(jnp.bfloat16), w)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-38
            return x + s.astype(x.dtype)
        return step

    for name, fn, w in (
        ("A 7x7/2 Cin=4  ", conv_a, wb),
        ("B s2d 4x4/1    ", conv_b, w2b),
        ("C s2d2 5x5/2   ", conv_c, w3b),
    ):
        per = chain_time(mk(fn, w), x, k1=4, k2=16)
        print(f"{name}: {per*1e3:7.3f} ms  {gf/per/1e3:6.1f} TF/s-useful",
              flush=True)


if __name__ == "__main__":
    main()
