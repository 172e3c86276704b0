"""Host entropy backend: CABAC streams, context tables, round-trips.

Golden byte strings below were produced by the REFERENCE entropy encoder
(a test oracle driving coolchic/cpp/TEncBinCoderCABAC + cc-contexts) — our
backend must match them byte for byte, since the C++ reference decoder
consumes these streams.
"""

import numpy as np
import pytest

from coolchic_tpu.bitstream.contexts import (
    N_MUQ,
    N_SIGQ,
    bac_state_idx_from_proba_0,
    generate_context_states,
    get_val_mu_indices,
)
from coolchic_tpu.bitstream.entropy import (
    WbDecoder,
    code_latent_layer,
    code_wb,
    decode_latent_layer,
)

GOLDEN_WB_XS = np.array([0, 1, -1, 5, -17, 128, 0, 0, -3, 42, 7, -7])
GOLDEN_WB = {
    0: "44a4f91c0217e3ba5008ec",
    2: "046cf49613f3ef9fbcaf",
}
GOLDEN_WB_SEARCH = (1, "13a368d0302f7c966537")

# fmt: off
GOLDEN_LAT = np.array([
    0,0,3,0,2,-2,0,3,0,0,0,0,-2,0,0,-3,0,0,-3,0,0,0,0,-4,-2,2,-1,4,0,0,-2,2,0,
    0,0,0,0,4,-3,0,0,0,0,0,0,-2,0,-1,-3,0,-1,-3,0,0,0,0,0,-3,-1,0,0,4,0,0,0,0,
    0,4,4,0,4,0,4,3,-4,0,3,0,0,0,-2,-2,0,0,0,4,0,4,0,-3,0,0,0,3,0,0,3,1,-2,
]).reshape(9, 11)
GOLDEN_MUS = np.array([
    -160,18,25,78,-123,-132,52,29,25,34,-68,23,29,-71,186,47,-119,65,-97,78,
    115,-82,96,41,82,189,-24,-75,-88,-81,-7,34,27,82,1,145,-26,272,62,-85,-107,
    48,-22,71,47,-7,-84,-151,-44,85,21,-124,17,38,-88,15,5,-114,35,56,108,105,
    -137,-93,51,51,51,385,57,113,95,65,-31,75,-77,-23,-48,8,231,-186,68,-161,
    -47,108,6,-107,-71,67,-73,21,4,-65,214,63,-202,18,-66,85,-79,
]).reshape(9, 11)
GOLDEN_LS = np.array([
    182,275,329,19,149,128,102,464,260,10,337,518,354,-27,127,390,93,266,316,
    60,191,-286,46,162,12,444,-14,133,219,416,-15,374,201,52,269,229,109,210,
    142,217,299,437,14,519,-92,177,288,242,106,168,126,111,327,253,96,334,246,
    321,294,75,115,312,291,196,217,391,111,282,169,167,364,323,322,395,203,302,
    153,248,180,214,289,77,513,49,17,373,318,293,294,198,65,211,98,346,177,76,
    151,261,115,
]).reshape(9, 11)
# fmt: on
GOLDEN_LAT_BYTES = (
    "fecfd83fdf7efdd8ffffb7ffbff6eedc7ebfeff7ff8ffa6ffffa87f95ada5becfdf1bf7e"
    "f74733fff0f5e3e7e3fffdfbf8f87f6ffe7fffffbd01ffdfc7a6f97ffbf7fa7ffc5fe0"
)


def test_context_table_shape_and_range():
    states = generate_context_states()
    assert states.shape == (N_MUQ + 1, N_SIGQ, 5)
    assert states.min() >= 1 and states.max() <= 127
    assert (states % 2 == 1).all()  # states are 2*idx + 1


def test_state_from_proba_endpoints():
    assert bac_state_idx_from_proba_0(0.999) == 1
    assert bac_state_idx_from_proba_0(0.5) == 2 * 32 + 1
    assert bac_state_idx_from_proba_0(0.001) == 127


def test_val_mu_indices():
    # mu = 0 -> centered bin, sigma mid-range.
    mur, mui, sigi = get_val_mu_indices(0, 256)
    assert (mur, mui) == (0, 8)
    # mu = 0.5 * 256: rounds away from zero to 1, offset -0.5 -> bin 0.
    mur, mui, _ = get_val_mu_indices(128, 256)
    assert mur == 1 and mui == 0
    mur, mui, _ = get_val_mu_indices(-128, 256)
    assert mur == -1 and mui == 16
    # sigma clamping.
    assert get_val_mu_indices(0, -10_000)[2] == 0
    assert get_val_mu_indices(0, 10_000)[2] == N_SIGQ - 1


@pytest.mark.parametrize("count", [0, 2])
def test_wb_golden_bytes(count):
    data, used = code_wb(GOLDEN_WB_XS, count)
    assert used == count
    assert data.hex() == GOLDEN_WB[count]


def test_wb_search_golden():
    data, used = code_wb(GOLDEN_WB_XS, -1)
    assert used == GOLDEN_WB_SEARCH[0]
    assert data.hex() == GOLDEN_WB_SEARCH[1]


def test_wb_roundtrip_random():
    rng = np.random.RandomState(1)
    for _ in range(5):
        xs = rng.randint(-2000, 2000, rng.randint(1, 500))
        data, used = code_wb(xs, -1)
        back = WbDecoder(data).decode_continue(len(xs), used)
        np.testing.assert_array_equal(back, xs)


def test_wb_multiple_streams_concatenated():
    """The bitstream concatenates weight and bias substreams; decoding
    continues across them within one file via separate decoders per stream."""
    a = np.array([5, -2, 0, 7])
    b = np.array([0, 0, 1])
    da, ca = code_wb(a, -1)
    db, cb = code_wb(b, -1)
    # Each stream is independently terminated: decode each from its offset.
    blob = da + db
    d1 = WbDecoder(blob[: len(da)])
    np.testing.assert_array_equal(d1.decode_continue(4, ca), a)
    d2 = WbDecoder(blob[len(da) :])
    np.testing.assert_array_equal(d2.decode_continue(3, cb), b)


def test_latent_golden_bytes():
    data = code_latent_layer(GOLDEN_LAT, GOLDEN_MUS, GOLDEN_LS, 9, 11, 16)
    assert data.hex() == GOLDEN_LAT_BYTES


@pytest.mark.parametrize("blk", [16, -16, 0])
def test_latent_roundtrip(blk):
    rng = np.random.RandomState(2)
    h, w = 48, 40
    xs = rng.randint(-6, 7, (h, w))
    xs[rng.rand(h, w) < 0.6] = 0
    xs[:16, 16:32] = 2  # a flat non-zero block
    xs[16:32, :16] = 0  # a zero (flat) block
    mus = (rng.randn(h, w) * 120).astype(int)
    ls = (rng.randn(h, w) * 180 + 220).astype(int)
    data = code_latent_layer(xs, mus, ls, h, w, blk)
    back = decode_latent_layer(data, mus, ls, h, w, blk)
    np.testing.assert_array_equal(back, xs)


def test_latent_all_zero_is_tiny():
    h, w = 64, 64
    xs = np.zeros((h, w), int)
    mus = np.zeros((h, w), int)
    ls = np.full((h, w), 1200, int)  # large sigma -> near-uniform contexts
    data = code_latent_layer(xs, mus, ls, h, w, 16)
    # Flat map covers everything: stream is a handful of bytes, not ~h*w bits.
    assert len(data) < 32
    back = decode_latent_layer(data, mus, ls, h, w, 16)
    np.testing.assert_array_equal(back, xs)
