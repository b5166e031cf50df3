"""LSTM op — the TPU-native recurrent cell chain.

Reference analog: the legacy NMT stand-alone's LSTM node
(reference: nmt/lstm.cu:1-324, cell math in the cuDNN RNN descriptor;
nmt/rnn.h:24 chunks each layer into LSTM_PER_NODE_LENGTH=10-step nodes so
Legion can pipeline them across GPUs). The TPU design inverts that
structure: the whole time axis is ONE `lax.scan` inside the jitted step —
XLA unrolls nothing, the input-side gate matmul for ALL timesteps runs as
one large [B*T, E] x [E, 4H] MXU contraction up front, and only the
h @ Wh recurrence (inherently sequential) rides the scan. Cross-device
parallelism comes from sharding the batch (DP) or the hidden/gate dim
(TP) in the ShardingPlan instead of hand-placing timestep chunks.

Gate layout matches torch.nn.LSTM ([i, f, g, o] blocks of the 4H axis) so
the torch oracle tests compare weights 1:1 (tests/test_ops_parity.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ffconst import DataType, OperatorType
from ..core.graph import Op
from ..core.initializers import DefaultBiasInit, DefaultWeightInit
from ..core.tensor import TensorSpec


class LSTM(Op):
    op_type = OperatorType.OP_LSTM

    def __init__(
        self,
        name: str,
        input: TensorSpec,
        hidden_size: int,
        h0: TensorSpec = None,
        c0: TensorSpec = None,
        kernel_initializer=None,
        recurrent_initializer=None,
        bias_initializer=None,
    ):
        """input [B, T, E]; optional initial state h0/c0 [B, H] (both or
        neither — zero-initialized when absent, like cuDNN's null hx/cx).
        Outputs: the full hidden sequence [B, T, H] plus the final
        (h_T, c_T) [B, H] pair, so encoder->decoder chains (the reference
        NMT's hx/cx threading, nmt/rnn.cu:305-318) are plain graph edges.
        """
        assert (h0 is None) == (c0 is None), "pass both h0 and c0 or neither"
        inputs = [input] + ([h0, c0] if h0 is not None else [])
        super().__init__(name, inputs)
        assert input.num_dims == 3, f"LSTM input must be [B, T, E], got {input.shape}"
        b, t, e = input.shape
        h = int(hidden_size)
        self.hidden_size = h
        self.in_dim = int(e)
        self.seq_len = int(t)
        if h0 is not None:
            assert tuple(h0.shape) == (b, h) and tuple(c0.shape) == (b, h), (
                f"initial state must be [B, H]=({b}, {h}), got "
                f"{h0.shape}/{c0.shape}"
            )
        self._out((b, t, h))        # hidden sequence
        self._out((b, h), idx=1)    # final h
        self._out((b, h), idx=2)    # final c
        # torch layout: weight_ih [4H, E], weight_hh [4H, H], bias [4H]
        # (single fused bias; torch's b_ih + b_hh sum is one free vector)
        self._param("wx", (4 * h, e), kernel_initializer or DefaultWeightInit())
        self._param("wh", (4 * h, h),
                    recurrent_initializer or DefaultWeightInit())
        self._param("bias", (4 * h,), bias_initializer or DefaultBiasInit())

    def forward(self, params, inputs, ctx):
        x = inputs[0]
        b, t, e = x.shape
        hsz = self.hidden_size
        cdt = ctx.compute_dtype
        f32 = jnp.float32
        if len(inputs) == 3:
            h0, c0 = inputs[1].astype(f32), inputs[2].astype(f32)
        else:
            h0 = jnp.zeros((b, hsz), f32)
            c0 = jnp.zeros((b, hsz), f32)
        wx = params["wx"].astype(cdt)
        wh = params["wh"].astype(cdt)
        bias = params["bias"].astype(f32)
        # input-side gates for EVERY timestep in one MXU contraction;
        # only the recurrence stays sequential
        xg = jnp.dot(
            x.reshape(b * t, e).astype(cdt), wx.T,
            preferred_element_type=f32,
        ).reshape(b, t, 4 * hsz)
        xg_tm = jnp.transpose(xg, (1, 0, 2))  # time-major for the scan

        def step(carry, g_in):
            h, c = carry  # f32 state for numerical stability
            gates = (
                g_in
                + jnp.dot(h.astype(cdt), wh.T, preferred_element_type=f32)
                + bias
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h.astype(x.dtype)

        (h_t, c_t), ys = jax.lax.scan(step, (h0, c0), xg_tm)
        y = jnp.transpose(ys, (1, 0, 2))  # back to [B, T, H]
        return [y, h_t.astype(x.dtype), c_t.astype(x.dtype)]

    def cost_stats(self):
        b, t, _ = self.inputs[0].shape
        h, e = self.hidden_size, self.in_dim
        flops = 2.0 * b * t * (4 * h) * (e + h)
        bytes_ = 4.0 * (
            b * t * (e + 5 * h)  # x in, gates + y out
            + 4 * h * (e + h)    # weights
        )
        return {
            "flops": flops,
            "bytes": bytes_,
            "param_bytes": 4.0 * (4 * h * (e + h + 1)),
        }
