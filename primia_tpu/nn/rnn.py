"""Share-capable recurrent layers: RNN / GRU / LSTM cells + the
multi-layer, optionally-bidirectional wrapper.

Reference: ``syft/frameworks/torch/nn/rnn.py:1-385`` re-implements the
torch RNN family out of Linear + elementwise ops so the same modules
run over MPC tensor chains. Here the cells are engine-generic
functions over the ``nn.core`` op protocol — exactly like the CNN zoo:
pass ``PLAIN`` for plaintext, ``MpcEngine`` for additive-share
execution (whose ``sigmoid``/``tanh`` come from the FPT function
library, ``mpc/functions.py``). Same math as the reference cells:

- RNNCell: ``h' = act(W_xh x + b_xh + W_hh h + b_hh)`` (rnn.py:57-80)
- GRUCell: reset/update gates + candidate (rnn.py:82-108)
- LSTMCell: i/f/g/o gates, forget-gate bias init 1/hidden_size
  (rnn.py:110-150)

TPU-first structure: the time loop is a ``lax.scan`` under the plain
engine (one compiled step, O(1) program size in seq_len). Under the
MPC engine the loop is unrolled at trace time — each step must draw
FRESH dealer randomness from the stateful ``MpcContext``, which a scan
body (traced once) cannot do; encrypted sequence workloads are short,
so the unrolled program stays compileable.

Parameters are pytrees of (in, out)-layout Linear weights, so whole
RNNs encode-and-share through ``mpc.engine.encode_and_share``
unchanged.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NUM_CHUNKS = {"rnn": 1, "gru": 3, "lstm": 4}


# ----------------------------------------------------------------- init

def cell_init(key, input_size: int, hidden_size: int, kind: str = "lstm",
              bias: bool = True, dtype=jnp.float32):
    """One cell's parameters (reference ``RNNCellBase.reset_parameters``:
    U(-1/sqrt(h), 1/sqrt(h)); LSTM forget-gate biases initialized to
    1/hidden_size, rnn.py:119-126)."""
    k = NUM_CHUNKS[kind]
    kx, kh, kbx, kbh = jax.random.split(key, 4)
    std = 1.0 / math.sqrt(hidden_size)
    p = {
        "wxh": jax.random.uniform(kx, (input_size, k * hidden_size), dtype,
                                  -std, std),
        "whh": jax.random.uniform(kh, (hidden_size, k * hidden_size), dtype,
                                  -std, std),
    }
    if bias:
        p["bxh"] = jax.random.uniform(kbx, (k * hidden_size,), dtype, -std, std)
        p["bhh"] = jax.random.uniform(kbh, (k * hidden_size,), dtype, -std, std)
        if kind == "lstm":
            incr = 1.0 / hidden_size
            for b in ("bxh", "bhh"):
                p[b] = p[b].at[hidden_size:2 * hidden_size].set(incr)
    return p


def rnn_init(key, input_size: int, hidden_size: int, num_layers: int = 1,
             kind: str = "lstm", bias: bool = True, bidirectional: bool = False,
             dtype=jnp.float32):
    """Multi-layer (optionally bidirectional) parameters
    (reference ``RNNBase.__init__``, rnn.py:186-197)."""
    sizes = [input_size] + [hidden_size * (2 if bidirectional else 1)] * (
        num_layers - 1)
    keys = jax.random.split(key, 2 * num_layers)
    params = {"fwd": [cell_init(keys[i], sz, hidden_size, kind, bias, dtype)
                      for i, sz in enumerate(sizes)]}
    if bidirectional:
        params["bwd"] = [
            cell_init(keys[num_layers + i], sz, hidden_size, kind, bias, dtype)
            for i, sz in enumerate(sizes)]
    return params


# ---------------------------------------------------------------- cells

def _gates(E, p, x, h):
    gx = E.linear(x, p["wxh"], p.get("bxh"))
    gh = E.linear(h, p["whh"], p.get("bhh"))
    return gx, gh


def rnn_cell(E, p, x, h, nonlinearity: str = "tanh"):
    """h' = act(W_xh x + W_hh h) (rnn.py:73-80)."""
    gx, gh = _gates(E, p, x, h)
    s = E.add(gx, gh)
    return E.tanh(s) if nonlinearity == "tanh" else E.relu(s)


def gru_cell(E, p, x, h):
    """(rnn.py:91-108): r/z gates, candidate n, h' = n + z * (h - n)."""
    gx, gh = _gates(E, p, x, h)
    x_r, x_z, x_n = E.split_last(gx, 3)
    h_r, h_z, h_n = E.split_last(gh, 3)
    r = E.sigmoid(E.add(x_r, h_r))
    z = E.sigmoid(E.add(x_z, h_z))
    n = E.tanh(E.add(x_n, E.mul(r, h_n)))
    return E.add(n, E.mul(z, _sub(E, h, n)))


def lstm_cell(E, p, x, hc):
    """(rnn.py:128-150): i/f/g/o gates; returns (h', c')."""
    h, c = hc
    gx, gh = _gates(E, p, x, h)
    x_i, x_f, x_g, x_o = E.split_last(gx, 4)
    h_i, h_f, h_g, h_o = E.split_last(gh, 4)
    i = E.sigmoid(E.add(x_i, h_i))
    f = E.sigmoid(E.add(x_f, h_f))
    g = E.tanh(E.add(x_g, h_g))
    o = E.sigmoid(E.add(x_o, h_o))
    c_ = E.add(E.mul(f, c), E.mul(i, g))
    return E.mul(o, E.tanh(c_)), c_


def _sub(E, a, b):
    # both engines' add is linear; negate-via-mul is free in both
    from primia_tpu.mpc.shares import AShare

    if isinstance(a, AShare):
        return E.add(a, AShare(-b.data))
    return a - b


# ------------------------------------------------------------ the layer

def _step(E, cells, xs_t, states, kind, nonlinearity):
    """One time step through the layer stack; returns new states and
    the top layer's output (reference ``_apply_time_step``,
    rnn.py:293-310)."""
    new_states = []
    inp = xs_t
    for p, st in zip(cells, states):
        if kind == "lstm":
            h, c = lstm_cell(E, p, inp, st)
            new_states.append((h, c))
            inp = h
        elif kind == "gru":
            h = gru_cell(E, p, inp, st)
            new_states.append(h)
            inp = h
        else:
            h = rnn_cell(E, p, inp, st, nonlinearity)
            new_states.append(h)
            inp = h
    return new_states, inp


def _run_direction(E, cells, x, states, kind, nonlinearity, reverse, seq_len):
    if E.name == "plain":
        def body(carry, x_t):
            new, out = _step(E, cells, x_t, carry, kind, nonlinearity)
            return new, out

        xs = jnp.flip(x, 0) if reverse else x
        states, outs = jax.lax.scan(body, states, xs)
        outs = jnp.flip(outs, 0) if reverse else outs
        return states, outs
    # MPC engine: unroll — each step draws fresh dealer randomness
    order = range(seq_len - 1, -1, -1) if reverse else range(seq_len)
    outs = [None] * seq_len
    for t in order:
        states, out = _step(E, cells, E.time_slice(x, t), states, kind,
                            nonlinearity)
        outs[t] = out
    return states, E.stack_time(outs)


def rnn_apply(E, params, x, hc=None, *, kind: str = "lstm",
              nonlinearity: str = "tanh", batch_first: bool = False):
    """Run the full RNN (reference ``RNNBase.forward``, rnn.py:199-267).

    ``x``: (T, B, F), or (B, T, F) with ``batch_first``. Returns
    ``(output, h_n)`` — output (T, B, H * num_directions), h_n a list
    of per-(layer, direction) final states ((h, c) tuples for LSTM) —
    flattened [fwd_0, ..., fwd_L, bwd_0, ..., bwd_L].
    """
    if batch_first:
        x = E.swap_time_batch(x)
    seq_len = x.shape[0] if E.name == "plain" else x.data.shape[1]
    batch = x.shape[1] if E.name == "plain" else x.data.shape[2]
    hidden = params["fwd"][0]["whh"].shape[0]  # AShare.shape strips party axis

    def init_states(cells):
        sts = []
        for _ in cells:
            z = E.zeros((batch, hidden), x)
            sts.append((z, z) if kind == "lstm" else z)
        return sts

    if hc is None:
        st_f = init_states(params["fwd"])
        st_b = init_states(params["bwd"]) if "bwd" in params else None
    else:
        n = len(params["fwd"])
        st_f = hc[:n]
        st_b = hc[n:] if "bwd" in params else None

    st_f, out_f = _run_direction(E, params["fwd"], x, st_f, kind,
                                 nonlinearity, False, seq_len)
    if "bwd" in params:
        st_b, out_b = _run_direction(E, params["bwd"], x, st_b, kind,
                                     nonlinearity, True, seq_len)
        if E.name == "plain":
            out = jnp.concatenate([out_f, out_b], axis=-1)
        else:
            out = E.concat_last([out_f, out_b])
        final = list(st_f) + list(st_b)
    else:
        out = out_f
        final = list(st_f)

    if batch_first:
        out = E.swap_time_batch(out)
    return out, final
