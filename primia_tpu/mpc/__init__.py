"""MPC engine: fixed-point codec, additive shares, Beaver triples,
DPF/DCF function secret sharing, share-space NN ops, encrypted
inference, and secure aggregation — the TPU-native replacement for the
reference's ``syft/frameworks/torch/mpc`` + share-space
``nn.functional``."""

from primia_tpu.mpc import beaver, compare, dcf, fixed, prg, shares  # noqa: F401
from primia_tpu.mpc.engine import (  # noqa: F401
    MpcContext,
    MpcEngine,
    encode_and_share,
    reveal_and_decode,
)
from primia_tpu.mpc.shares import AShare  # noqa: F401
