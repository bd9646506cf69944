"""Permuter golden tests: round-trip and parity with a loop-based re-derivation
of the reference packing semantics (`modules/dynamic_modules/permuter.py`)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dynamicvectorquantization_tpu.models.permuter import DualGrainSeparatePermuter


def _reference_pack(indices, grains, order, pads):
    """Loop/py re-derivation of the reference's per-sample packing (the spec in
    permuter.py:50-109), padded to the batch max like torch pad_sequence."""
    b = indices.shape[0]
    hw1 = grains.shape[1]
    hw2 = indices.shape[1] // hw1
    fine_hw = indices.shape[1]
    out = {k: [] for k in ["cc", "cp", "fc", "fp"]}
    pos_fine = np.arange(fine_hw * fine_hw).reshape(fine_hw, fine_hw)
    for i in range(b):
        cc, cp, fc, fp = [], [], [], []
        for r in range(hw1):
            for c in range(hw1):
                if grains[i, r, c] == 0:
                    cc.append(indices[i, r * hw2, c * hw2])
                    cp.append(r * hw1 + c)
        if order == "region-first":
            for r in range(hw1):
                for c in range(hw1):
                    if grains[i, r, c] == 1:
                        for dr in range(hw2):
                            for dc in range(hw2):
                                fc.append(indices[i, r * hw2 + dr, c * hw2 + dc])
                                fp.append(pos_fine[r * hw2 + dr, c * hw2 + dc])
        else:  # row-first
            for rr in range(fine_hw):
                for cc_ in range(fine_hw):
                    if grains[i, rr // hw2, cc_ // hw2] == 1:
                        fc.append(indices[i, rr, cc_])
                        fp.append(pos_fine[rr, cc_])
        cc.append(pads["content_eos"]); cp.append(pads["coarse_pos_eos"])
        fc.append(pads["content_eos"]); fp.append(pads["fine_pos_eos"])
        out["cc"].append(cc); out["cp"].append(cp)
        out["fc"].append(fc); out["fp"].append(fp)
    return out


PADS = dict(
    content_pad=1024, content_eos=1025,
    coarse_pos_pad=256, coarse_pos_eos=257,
    fine_pos_pad=1024, fine_pos_eos=1025,
)


@pytest.mark.parametrize("order", ["region-first", "row-first"])
def test_pack_matches_reference_semantics(order, np_rng):
    indices = np_rng.integers(0, 1024, size=(3, 32, 32))
    grains = np_rng.integers(0, 2, size=(3, 16, 16))
    perm = DualGrainSeparatePermuter(
        coarse_hw=16, fine_hw=32, fine_position_order=order,
        content_pad_code=1024, content_eos_code=1025,
        coarse_position_pad_code=256, coarse_position_eos_code=257,
        fine_position_pad_code=1024, fine_position_eos_code=1025,
    )
    out = perm.forward(jnp.asarray(indices), jnp.asarray(grains))
    want = _reference_pack(indices, grains, order, PADS)
    for i in range(3):
        got_cc = np.asarray(out["coarse_content"][i])
        got_cp = np.asarray(out["coarse_position"][i])
        got_fc = np.asarray(out["fine_content"][i])
        got_fp = np.asarray(out["fine_position"][i])
        n = len(want["cc"][i])
        np.testing.assert_array_equal(got_cc[:n], want["cc"][i])
        np.testing.assert_array_equal(got_cp[:n], want["cp"][i])
        assert (got_cc[n:] == 1024).all() and (got_cp[n:] == 256).all()
        m = len(want["fc"][i])
        np.testing.assert_array_equal(got_fc[:m], want["fc"][i])
        np.testing.assert_array_equal(got_fp[:m], want["fp"][i])
        assert (got_fc[m:] == 1024).all() and (got_fp[m:] == 1024).all()
    # segments
    assert (np.asarray(out["coarse_segment"]) == 0).all()
    assert (np.asarray(out["fine_segment"]) == 1).all()


@pytest.mark.parametrize("order", ["region-first", "row-first"])
@pytest.mark.parametrize("hw", [(4, 8), (16, 32)])
def test_roundtrip(order, hw, np_rng):
    """forward -> forward_back must reproduce the original dense code map
    (the reference's executable self-test, permuter.py:139-307)."""
    hw1, fine = hw
    indices = np_rng.integers(0, 1024, size=(2, fine, fine))
    grains = np_rng.integers(0, 2, size=(2, hw1, hw1))
    # coarse regions replicate one code across the 2x2 block (as the encoder
    # merge guarantees) so the round-trip is exact
    rep = np.repeat(np.repeat(grains, 2, axis=1), 2, axis=2)
    base = np_rng.integers(0, 1024, size=(2, hw1, hw1))
    base_rep = np.repeat(np.repeat(base, 2, axis=1), 2, axis=2)
    original = np.where(rep == 1, indices, base_rep)

    perm = DualGrainSeparatePermuter(
        coarse_hw=hw1, fine_hw=fine, fine_position_order=order,
        content_pad_code=1024, content_eos_code=1025,
        coarse_position_pad_code=hw1 * hw1, coarse_position_eos_code=hw1 * hw1 + 1,
        fine_position_pad_code=fine * fine, fine_position_eos_code=fine * fine + 1,
    )
    out = perm.forward(jnp.asarray(original), jnp.asarray(grains))
    back = perm.forward_back(
        out["coarse_content"], out["fine_content"],
        out["coarse_position"], out["fine_position"],
    )
    np.testing.assert_array_equal(np.asarray(back), original)


def test_all_fine_and_all_coarse_extremes():
    perm = DualGrainSeparatePermuter(coarse_hw=4, fine_hw=8,
                                     coarse_position_pad_code=16,
                                     coarse_position_eos_code=17,
                                     fine_position_pad_code=64,
                                     fine_position_eos_code=65)
    indices = jnp.arange(2 * 64).reshape(2, 8, 8) % 1024
    all_fine = jnp.ones((2, 4, 4), jnp.int32)
    out = perm.forward(indices, all_fine)
    # coarse stream = just EOS then pads
    assert int(out["coarse_content"][0, 0]) == 1025
    assert int(out["coarse_position"][0, 0]) == 17
    # fine stream fills completely: 64 codes + eos = capacity 65
    assert int(out["fine_content"][0, 64]) == 1025

    all_coarse = jnp.zeros((2, 4, 4), jnp.int32)
    out = perm.forward(indices, all_coarse)
    assert int(out["coarse_content"][0, 16]) == 1025
    assert int(out["fine_content"][0, 0]) == 1025
