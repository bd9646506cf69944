"""Greedy sampling parity, part 2 (VERDICT r03 #5): free fine positions and
the class-conditional sampler, against the ACTUAL reference samplers.

Free-fine-position mode (`fix_fine_position=False`,
`/root/reference/models/stage2_dynamic/dqtransformer_uncond_entropy.py:365-458,495-520`):
the reference's `sample_fine_position` IS training-consistent (it rebuilds
the position-transformer input exactly as training does, `stackgpt.py:278-303`),
so fine positions must match token-for-token as long as the content inputs
agree; fine CONTENTS hit QUIRKS #11 (the reference's `sample_fine_content`
uses unshifted coarse position embeddings), so — as in
`tests/test_sampling_parity.py` — our contents are asserted against the
greedy argmax of the reference's TRAINING forward, and every fine position
we sample is asserted against the reference's ban rules
(`avoid_repeat_or_enforce_pad_for_fine_position`, `:511-520`) applied to the
reference's training-forward position logits.

Class-conditional (`dqtransformer_class2_entropy.py:467-496,544-558`): class
tokens prefix all four streams (ClassAwareSOSProvider), the fixed-fine
schedule is class-prefixed (`transfer_*`: `c_position = coarse_position[:, :1]`),
and the masks ban the class ranges (content: everything >= eos; fine
position: everything > eos).

The user-facing statement of this contract (what IS bit-exact vs a
reference checkpoint and what deliberately isn't) lives in README.md,
"Sampler parity caveat (free-fine mode)".
"""
import importlib

import numpy as np
import pytest
import torch

from tests.test_reference_parity import (  # noqa: F401 (ref fixture)
    REF_ROOT,
    _model_kwargs,
    _our_kwargs,
    ref,
)
from tests.test_sampling_parity import (  # noqa: F401 (models fixture)
    CB,
    _stage2_params,
    _upto_eos,
    models,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF_ROOT.exists(), reason="reference repo not available"),
]

EOS_POS_COARSE = 17
EOS_FINE = CB + 1


def _ref_greedy_free(ref_df, b):
    x0 = torch.zeros(b, 3, 64, 64)
    streams = ref_df.encode_to_c(x0)
    with torch.no_grad():
        out = ref_df.sample_from_scratch(
            *streams, temperature=1.0, sample=False, top_k=None, top_p=None,
            top_k_pos=None, top_p_pos=None, process=False,
            fix_fine_position=False,
        )
    return streams, [o.numpy() for o in out]


def _our_greedy_free(ours, variables, b):
    import jax
    import jax.numpy as jnp

    c = ours.encode_to_c(jnp.zeros((b, 1), jnp.int32))
    toks = ours.sample_from_scratch(
        variables, *c, jax.random.PRNGKey(0), temperature=1.0, sample=False,
        top_k=None, top_k_pos=None, fix_fine_position=False,
    )
    return c, [np.asarray(t) for t in toks]


def _ref_train_logits(ref_df, c_streams, o_coarse, o_fine, o_pos_c, o_pos_f,
                      nc, nf, i=0):
    """Reference TRAINING forward on our sampled streams (truncated at EOS,
    prefix re-attached). `i` selects the sample's row of the batched prefix
    streams (the o_* args are already the [i:i+1] slices). Returns
    (position_logits, content_logits, lc)."""
    c_c, c_f, c_pc, c_pf = (s.numpy()[i : i + 1] for s in c_streams[:4])
    coarse_content = np.concatenate([c_c, o_coarse[:, :nc]], axis=1)
    coarse_position = np.concatenate([c_pc, o_pos_c[:, :nc]], axis=1)
    fine_content = np.concatenate([c_f, o_fine[:, :nf]], axis=1)
    fine_position = np.concatenate([c_pf, o_pos_f[:, :nf]], axis=1)
    t = lambda a: torch.from_numpy(a.astype(np.int64))
    with torch.no_grad():
        out = ref_df.transformer(
            coarse_content=t(coarse_content), fine_content=t(fine_content),
            coarse_position=t(coarse_position), fine_position=t(fine_position),
            coarse_seg=torch.zeros_like(t(coarse_content)),
            fine_seg=torch.ones_like(t(fine_content)),
        )
    return (
        out["position_logits"][0].numpy(),
        out["content_logits"][0].numpy(),
        coarse_content.shape[1],
    )


def test_free_fine_transfer_ban_set_matches_reference(models):  # noqa: F811
    """Our fine-phase entry ban set == the reference's
    `transfer_sampled_coarse_position_to_sampled_fine_position` output
    (covered fine positions) + its explicit sos ban, per sample."""
    ref_df, ours, variables = models
    b = 2
    c_streams, (r_coarse, r_fine, r_pos_c, r_pos_f) = (
        _stream_and_run_fixed(ref_df, b)
    )
    # reference transfer, fed the full coarse position stream incl. prefix
    # (ragged per-sample lengths -> pad with eos; the reference's per-sample
    # loop stops at the first eos)
    lists = [list(_upto_eos(r_pos_c[i], EOS_POS_COARSE)) for i in range(b)]
    max_l = max(len(li) for li in lists)
    padded = np.full((b, max_l), EOS_POS_COARSE, np.int64)
    for i, li in enumerate(lists):
        padded[i, : len(li)] = li
    full_pos_c = torch.from_numpy(
        np.concatenate([c_streams[2].numpy(), padded], axis=1).astype(np.int64)
    )
    transfered = ref_df.transfer_sampled_coarse_position_to_sampled_fine_position(
        full_pos_c
    ).numpy()

    # ours: covered = coarse regions expanded to fine rasters
    import jax.numpy as jnp

    coarse_mask = np.zeros((b, 16), bool)
    for i in range(b):
        for p in _upto_eos(r_pos_c[i], EOS_POS_COARSE):
            if p < 16:
                coarse_mask[i, p] = True
    covered = np.asarray(
        ours._coarse_covered_to_fine_positions(jnp.asarray(coarse_mask))
    )
    for i in range(b):
        ref_set = {int(v) for v in transfered[i]
                   if v < 64}  # drop pad / sos prefix entries
        our_set = {int(j) for j in np.flatnonzero(covered[i])}
        assert our_set == ref_set, f"sample {i}: covered-fine-position sets differ"


def _stream_and_run_fixed(ref_df, b):
    x0 = torch.zeros(b, 3, 64, 64)
    streams = ref_df.encode_to_c(x0)
    with torch.no_grad():
        out = ref_df.sample_from_scratch(
            *streams, temperature=1.0, sample=False, top_k=None, top_p=None,
            top_k_pos=None, top_p_pos=None, process=False,
            fix_fine_position=True,
        )
    return streams, [o.numpy() for o in out]


def test_free_fine_greedy_positions_and_contents(models):  # noqa: F811
    ref_df, ours, variables = models
    b = 2
    c_streams, (r_coarse, r_fine, r_pos_c, r_pos_f) = _ref_greedy_free(ref_df, b)
    _, (o_coarse, o_fine, o_pos_c, o_pos_f) = _our_greedy_free(ours, variables, b)

    # coarse phase: token-for-token (both sides training-consistent)
    for i in range(b):
        rp = _upto_eos(r_pos_c[i], EOS_POS_COARSE)
        op = _upto_eos(o_pos_c[i], EOS_POS_COARSE)
        np.testing.assert_array_equal(op, rp, err_msg=f"coarse positions[{i}]")
        n = len(rp)
        np.testing.assert_array_equal(o_coarse[i][:n], r_coarse[i][:n])
        # first free fine position: the position path has no QUIRKS-#11
        # divergence and no content divergence yet -> must match exactly
        assert o_pos_f[i][0] == r_pos_f[i][0], f"first free fine position[{i}]"

    # full fine phase vs reference TRAIN-forward logits + reference ban rules.
    # The coarse stream must be fed at the BATCH-uniform length (max over
    # samples, incl. the sampler's pad tail for early finishers): both
    # samplers' fine phases run at global indices offset by the batch coarse
    # length, so per-sample truncation would shift every fine token's
    # absolute position.
    nc_u = max(len(_upto_eos(o_pos_c[k], EOS_POS_COARSE)) for k in range(b))
    for i in range(b):
        nc = nc_u
        nf = len(_upto_eos(o_pos_f[i], EOS_FINE))
        pos_logits, content_logits, lc = _ref_train_logits(
            ref_df, c_streams, o_coarse[i:i + 1], o_fine[i:i + 1],
            o_pos_c[i:i + 1], o_pos_f[i:i + 1], nc, nf, i=i,
        )
        covered = set()
        for p in o_pos_c[i][:nc]:
            if p < 16:
                for dr in range(2):
                    for dc in range(2):
                        covered.add((p // 4 * 2 + dr) * 8 + (p % 4 * 2 + dc))
        sampled = set(covered)
        sos = CB + 2
        pos_mis, con_mis = [], []
        for j in range(nf):
            target = int(o_pos_f[i][j])
            # reference ban (avoid_repeat_or_enforce_pad_for_fine_position):
            # ban transfered (covered+sampled) + pad + sos; keep eos
            row = pos_logits[lc + j].copy()
            for bp in sampled:
                row[bp] = -np.inf
            row[CB] = -np.inf  # pad
            row[sos] = -np.inf
            if int(row.argmax()) != target:
                pos_mis.append(j)
            if target == EOS_FINE:
                break
            sampled.add(target)
            crow = content_logits[lc + j].copy()
            crow[[CB, CB + 1, sos]] = -np.inf
            if int(crow.argmax()) != int(o_fine[i][j]):
                con_mis.append(j)
        assert not pos_mis, f"free fine positions diverge at {pos_mis} (sample {i})"
        assert not con_mis, f"fine contents diverge at {con_mis} (sample {i})"


# --------------------------------------------------------------------- class
N_CLASSES = 10


def _class_params():
    tp, _, pp = _stage2_params()
    tp = dict(tp, vocab_size=CB + 2 + N_CLASSES,
              coarse_position_size=18 + N_CLASSES,
              fine_position_size=CB + 2 + N_CLASSES)
    cond = dict(
        n_classes=N_CLASSES, threshold_content=CB + 2,
        threshold_coarse_position=18, threshold_fine_position=CB + 2,
        coarse_seg_sos=0, fine_seg_sos=1,
    )
    return tp, cond, pp


@pytest.fixture(scope="module")
def class_models(ref):  # noqa: F811
    tp, cond, pp = _class_params()
    ref_mod = importlib.import_module(
        "models.stage2_dynamic.dqtransformer_class2_entropy"
    )
    torch.manual_seed(13)
    ref_df = ref_mod.Dualformer(
        transformer_config={
            "target": "modules.dynamic_modules.stackgpt.StackGPT", "params": tp
        },
        first_stage_config={
            "target": "models.stage1_dynamic.dqvae_dual_entropy.DualGrainVQModel",
            "params": _model_kwargs(True),
        },
        class_cond_stage_config={
            "target": "modules.dynamic_modules.label_provider.ClassAwareSOSProvider",
            "params": cond,
        },
        permuter_config={
            "target": "modules.dynamic_modules.permuter.DualGrainSeperatePermuter",
            "params": pp,
        },
    ).eval()
    with torch.no_grad():
        ref_df.transformer.pos_emb.normal_(0.0, 0.02)

    import jax

    from dynamicvectorquantization_tpu.models.dqtransformer import (
        ClassCondDualformer,
    )
    from dynamicvectorquantization_tpu.utils.torch_ckpt import (
        convert_stackgpt_state_dict,
    )

    ours = ClassCondDualformer(
        transformer_config={
            "target": "modules.dynamic_modules.stackgpt.StackGPT", "params": tp
        },
        first_stage_config={
            "target": "models.stage1_dynamic.dqvae_dual_entropy.DualGrainVQModel",
            "params": _our_kwargs(_model_kwargs(True)),
        },
        class_cond_stage_config={
            "target": "modules.dynamic_modules.label_provider.ClassAwareSOSProvider",
            "params": cond,
        },
        permuter_config={
            "target": "modules.dynamic_modules.permuter.DualGrainSeperatePermuter",
            "params": pp,
        },
    )
    sd = {k: v.detach().numpy() for k, v in ref_df.state_dict().items()
          if k.startswith("transformer.")}
    tvars = convert_stackgpt_state_dict(sd, prefix="transformer.")
    fs_vars = ours.first_stage_model.init(jax.random.PRNGKey(0))
    variables = {"transformer": tvars, "first_stage": fs_vars}
    return ref_df, ours, variables


def test_class_conditional_greedy_fixed_fine(class_models):
    """Class-conditional fixed-fine greedy: coarse phase token-for-token
    (incl. the class-token prefix semantics), class-prefixed fine-position
    schedule exact, fine contents == reference TRAIN-forward greedy under
    the reference's class bans (`dqtransformer_class2_entropy.py:544-558`:
    content bans pad + everything >= eos)."""
    ref_df, ours, variables = class_models
    b = 2
    labels = torch.tensor([1, 7])
    streams = ref_df.encode_to_c(labels)
    with torch.no_grad():
        r_out = ref_df.sample_from_scratch(
            *streams, temperature=1.0, sample=False, top_k=None, top_p=None,
            top_k_pos=None, top_p_pos=None, process=False,
            fix_fine_position=True,
        )
    r_coarse, r_fine, r_pos_c, r_pos_f = [o.numpy() for o in r_out]

    import jax
    import jax.numpy as jnp

    c = ours.encode_to_c(jnp.asarray([1, 7], jnp.int32))
    o_toks = ours.sample_from_scratch(
        variables, *c, jax.random.PRNGKey(0), temperature=1.0, sample=False,
        top_k=None, top_k_pos=None, fix_fine_position=True,
    )
    o_coarse, o_fine, o_pos_c, o_pos_f = [np.asarray(t) for t in o_toks]

    for i in range(b):
        rp = _upto_eos(r_pos_c[i], EOS_POS_COARSE)
        op = _upto_eos(o_pos_c[i], EOS_POS_COARSE)
        np.testing.assert_array_equal(op, rp, err_msg=f"class coarse positions[{i}]")
        n = len(rp)
        np.testing.assert_array_equal(
            o_coarse[i][:n], r_coarse[i][:n], err_msg=f"class coarse contents[{i}]"
        )
        rf = _upto_eos(r_pos_f[i], EOS_FINE)
        np.testing.assert_array_equal(
            o_pos_f[i][: len(rf)], rf,
            err_msg=f"class-prefixed fine position schedule[{i}]",
        )

    # fine contents: teacher-forced vs reference training forward + class
    # bans. Batch-uniform coarse length (see the free-fine test): the fine
    # phase's absolute positions are offset by the batch coarse length.
    nc_u = max(len(_upto_eos(o_pos_c[k], EOS_POS_COARSE)) for k in range(b))
    for i in range(b):
        nc = nc_u
        nf = len(_upto_eos(o_pos_f[i], EOS_FINE))
        pos_logits, content_logits, lc = _ref_train_logits(
            ref_df, streams, o_coarse[i:i + 1], o_fine[i:i + 1],
            o_pos_c[i:i + 1], o_pos_f[i:i + 1], nc, nf, i=i,
        )
        mismatches = []
        for j in range(nf):
            if o_pos_f[i, j] == EOS_FINE:
                break
            crow = content_logits[lc + j].copy()
            crow[CB] = -np.inf  # pad
            crow[CB + 1:] = -np.inf  # eos + class range
            if int(crow.argmax()) != int(o_fine[i, j]):
                mismatches.append(j)
        assert not mismatches, (
            f"class fine contents diverge from TRAIN-forward greedy at "
            f"{mismatches} (sample {i})"
        )


def test_class_token_bans_in_masks(class_models):
    """Unit check of the class ban masks against the reference rules: the
    class ranges can never be sampled."""
    import jax.numpy as jnp

    _, ours, _ = class_models
    b = 1
    v = CB + 2 + N_CLASSES
    logits = jnp.zeros((b, v))
    done = jnp.zeros((b,), bool)
    out = np.asarray(ours._content_mask(logits, done))
    banned = np.flatnonzero(out[0] < -1e8)
    # content: pad + eos + all classes (everything >= eos)
    assert set(banned) == {CB} | set(range(CB + 1, v))

    pos_ban = jnp.zeros((b, v), bool)
    outp = np.asarray(ours._fine_position_mask(logits, pos_ban, done))
    bannedp = set(np.flatnonzero(outp[0] < -1e8))
    # fine position: pad + class range (> eos); eos allowed
    assert bannedp == {CB} | set(range(CB + 2, v))
