"""Recurrent state encoder: LSTM/GRU with episode-boundary masking.

Counterpart of the reference's RNNStateEncoder
(habitat-baselines/habitat_baselines/rl/models/rnn_state_encoder.py), which
packs variable-length sequences so one torch RNN call spans T×N steps with
mid-rollout resets (build_pack_info_from_dones:155, build_rnn_inputs:187,
seq_forward:318). On TPU there is no packed-sequence machinery: we ``lax.scan``
over time with mask-gated hidden resets — bit-identical semantics (hidden state
is zeroed wherever the previous step ended an episode), fixed shapes, and the
matmuls stay on the MXU (SURVEY §5.7 equivalence note).

API mirrors the reference: ``single_forward`` (T=1 act path) and
``seq_forward`` (T×N update path), both via ``__call__`` on shapes.
Hidden state layout: (N, num_layers, 2 (h,c) or 1, hidden_size) — batch-major
so it slots into the rollout pytree.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def initial_hidden_state(
    batch: int, hidden_size: int, num_layers: int = 1, rnn_type: str = "LSTM"
) -> jnp.ndarray:
    """Zero hidden state (N, L, S, H) without constructing a module (usable
    outside flax apply contexts)."""
    s = 2 if rnn_type.upper() == "LSTM" else 1
    return jnp.zeros((batch, num_layers, s, hidden_size), jnp.float32)


class RNNStateEncoder(nn.Module):
    hidden_size: int = 512
    num_layers: int = 1
    rnn_type: str = "LSTM"  # "LSTM" | "GRU"
    dtype: Any = jnp.float32

    @property
    def num_recurrent_state(self) -> int:
        return 2 if self.rnn_type == "LSTM" else 1

    def initial_state(self, batch: int) -> jnp.ndarray:
        return jnp.zeros(
            (batch, self.num_layers, self.num_recurrent_state, self.hidden_size),
            self.dtype,
        )

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, hidden: jnp.ndarray, masks: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (N, D) single step or (T, N, D) sequence.
        hidden: (N, L, S, H). masks: (N,) or (T, N) — 0 where the episode
        ended at the PREVIOUS step (reference "not done" masks).
        Returns (out, new_hidden): out (N, H) or (T, N, H)."""
        cells = []
        for l in range(self.num_layers):
            if self.rnn_type == "LSTM":
                cells.append(nn.OptimizedLSTMCell(self.hidden_size, name=f"lstm_{l}"))
            else:
                cells.append(nn.GRUCell(self.hidden_size, name=f"gru_{l}"))

        def step(hid, xt, mt):
            # hid: (N,L,S,H); xt: (N,D); mt: (N,)
            m = mt.astype(hid.dtype).reshape(-1, 1)
            inp = xt
            new_layers = []
            for l, cell in enumerate(cells):
                if self.rnn_type == "LSTM":
                    c = hid[:, l, 0] * m
                    h = hid[:, l, 1] * m
                    (new_c, new_h), out = cell((c, h), inp)
                    new_layers.append(jnp.stack([new_c, new_h], axis=1))
                else:
                    h = hid[:, l, 0] * m
                    new_h, out = cell(h, inp)
                    new_layers.append(new_h[:, None, :])
                inp = out
            return jnp.stack(new_layers, axis=1), inp

        if x.ndim == 2:  # single step
            new_hidden, out = step(hidden, x, masks)
            return out, new_hidden

        # sequence: scan over T
        def scan_fn(hid, xm):
            xt, mt = xm
            new_hid, out = step(hid, xt, mt)
            return new_hid, out

        new_hidden, outs = jax.lax.scan(scan_fn, hidden, (x, masks))
        return outs, new_hidden


def build_rnn_state_encoder(
    input_size: int,
    hidden_size: int,
    rnn_type: str = "LSTM",
    num_layers: int = 1,
) -> RNNStateEncoder:
    """Name-parity builder (reference rnn_state_encoder.py:430)."""
    del input_size  # inferred lazily by flax
    return RNNStateEncoder(
        hidden_size=hidden_size, num_layers=num_layers, rnn_type=rnn_type.upper()
    )
