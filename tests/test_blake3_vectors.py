"""Raw-math pins for the BLAKE3 G function and 7-round compression
permutation against the reference's hardcoded expected outputs
(reference blake3.rs:2615-2746 `g_function_test_vector` /
`compression_test_vector`).  These vectors are outputs of the public
BLAKE3 round function on fixed inputs; matching them pins our `_g`
primitive, the round schedule, MSG_PERM, and the xor finalization —
independently of the full-hash pins in test_blake3.py."""

from multistark_tpu.hash.blake3 import MSG_PERM, _g
from multistark_tpu.test_circuits.blake3_circuit import _Ops, _g_instrumented

G_IN = (0x11111111, 0x22222222, 0x33333333, 0x44444444, 0x55555555, 0x66666666)
G_OUT = (0xCCCCCCCB, 0x45B64444, 0x06FFFFFF, 0x07000000)  # blake3.rs:2640-2643

STATE_IN = [
    0x00000000, 0x00001111, 0x00002222, 0x00003333,
    0x00004444, 0x00005555, 0x00006666, 0x00007777,
    0x00008888, 0x00009999, 0x0000AAAA, 0x0000BBBB,
    0x0000CCCC, 0x0000DDDD, 0x0000EEEE, 0x0000FFFF,
]
MSG_IN = [
    0x00000000, 0x11110000, 0x22220000, 0x33330000,
    0x44440000, 0x55550000, 0x66660000, 0x77770000,
    0x88880000, 0x99990000, 0xAAAA0000, 0xBBBB0000,
    0xCCCC0000, 0xDDDD0000, 0xEEEE0000, 0xFFFF0000,
]
STATE_OUT = [  # blake3.rs:2727-2744
    0xD304E51C, 0xC2DF34A0, 0x5EBA7F1F, 0x2AB9650F,
    0xD9CEF159, 0x4E9D3A6A, 0xCAC2E310, 0xC6B9BE7E,
    0xAD9FD58A, 0x0899E71B, 0xCA51A599, 0xC3FBD7C0,
    0x751D2F26, 0x6CD0AC6B, 0xC58F3C1D, 0xE6D65414,
]


def test_g_function_vector_host():
    st = list(G_IN[:4])
    _g(st, 0, 1, 2, 3, G_IN[4], G_IN[5])
    assert tuple(st) == G_OUT


def test_g_function_vector_instrumented():
    """The circuit witness builder's instrumented G must produce the same
    outputs as the plain host G on the reference vector."""
    (a, b, c, d), row = _g_instrumented(*G_IN, _Ops())
    assert (a, b, c, d) == G_OUT
    assert row[:6] == list(G_IN) and row[-1] == 1


def test_compression_permutation_vector():
    """7 rounds over a RAW 16-word state (arbitrary values in the IV /
    counter slots, unlike the structured `compress` entry) + xor
    finalization, against the reference's expected state."""
    st = list(STATE_IN)
    m = list(MSG_IN)
    for _ in range(7):
        _g(st, 0, 4, 8, 12, m[0], m[1])
        _g(st, 1, 5, 9, 13, m[2], m[3])
        _g(st, 2, 6, 10, 14, m[4], m[5])
        _g(st, 3, 7, 11, 15, m[6], m[7])
        _g(st, 0, 5, 10, 15, m[8], m[9])
        _g(st, 1, 6, 11, 12, m[10], m[11])
        _g(st, 2, 7, 8, 13, m[12], m[13])
        _g(st, 3, 4, 9, 14, m[14], m[15])
        m = [m[p] for p in MSG_PERM]
    out = [st[i] ^ st[i + 8] for i in range(8)] + [
        st[i + 8] ^ STATE_IN[i] for i in range(8)
    ]
    assert out == STATE_OUT
