"""Trustworthy per-iteration timing on the tunneled TPU.

On this image the 'axon' platform's host sync primitives are unreliable:
`jax.block_until_ready` sometimes returns before device execution finishes
(XLA conv microbenches "measured" >5000 TF/s), and a device->host scalar
pull pays a 0.7-1.6s tunnel round trip with high variance. Neither gives a
usable per-iteration time by itself.

Robust recipe (used by all exp_* scripts):
  - run the op under test k times INSIDE one jit via lax.fori_loop with a
    carried data dependency (compiles once, executes serially on device);
  - time the whole call including one SCALAR pull, for two chain lengths;
  - per-iter = (t(k2) - t(k1)) / (k2 - k1): the tunnel RTT, dispatch cost
    and pull latency cancel in the difference.
Variance is handled by taking the MIN over repeats of each chain timing
(RTT noise only ever adds time).

CRITICAL: the pull must be of a device-side SCALAR (jit the reduction to a
() array, then float()). `np.asarray(big_array).ravel()[0]` ships the WHOLE
array through the tunnel at ~6-25 MB/s — a 268MB activation "scalar pull"
takes 43 SECONDS.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def chain_time(step, init, k1=4, k2=16, repeats=3):
    """Per-iteration seconds of `step` (carry -> carry), slope method.

    `step` must return a pytree of the same structure as `init` so the
    fori_loop carries a true data dependency between iterations.
    """

    def chain(k):
        def run(x):
            out = lax.fori_loop(0, k, lambda i, c: step(c), x)
            # reduce to a () scalar ON DEVICE so the sync pull is tiny
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32).ravel()[:1])

        return jax.jit(run)

    c1, c2 = chain(k1), chain(k2)

    def timed(c):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            _ = float(c(init))  # () array -> host: one tunnel RTT
            best = min(best, time.time() - t0)
        return best

    # compile both before timing
    for c in (c1, c2):
        _ = float(c(init))
    t1, t2 = timed(c1), timed(c2)
    return (t2 - t1) / (k2 - k1)
