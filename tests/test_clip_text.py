"""From-scratch CLIP text tower + BPE tokenizer.

Parity: a torch replica of the reference's vendored text transformer
(`modules/text_encoders/clip_text_encoder/clip/model.py:152-300`,
nn.MultiheadAttention, causal mask, QuickGELU) is random-initialized, its
state_dict converted through `convert_clip_text_state_dict`, and the JAX
tower must reproduce both the post-ln_final sequence features and the
eot-pooled projection.
"""
import gzip

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamicvectorquantization_tpu.utils.clip_bpe import (
    SOT,
    EOT,
    ClipBPETokenizer,
    Tokenize,
    byte_unicode_table,
    tokenize,
)


# ------------------------------------------------------------- tokenizer


def test_byte_table_reversible():
    t = byte_unicode_table()
    assert len(t) == 256 and len(set(t.values())) == 256


def test_bpe_fallback_roundtrip():
    tok = ClipBPETokenizer()  # no merges: byte-level fallback
    ids = tok.encode("Hello, world!")
    assert ids, "empty encoding"
    assert tok.decode(ids) == "hello , world !"  # regex splits punctuation
    # vocab layout: 256 + 256 + 0 merges + 2 specials
    assert tok.vocab_size == 514
    assert tok.eot_token == 513 and tok.sot_token == 512


def test_bpe_merges(tmp_path):
    # merge table: build "hello</w>" greedily from bytes
    merges = ["h e", "l l", "he ll", "hell o</w>"]
    p = tmp_path / "bpe.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("#version\n" + "\n".join(merges) + "\n")
    tok = ClipBPETokenizer(bpe_path=str(p))
    assert tok.vocab_size == 514 + len(merges)
    ids = tok.encode("hello")
    assert [tok.decoder[i] for i in ids] == ["hello</w>"]
    # "fellow" -> f e ll o w</w> -> 'll' merges, 'lo w</w>' cannot (split ll)
    ids = tok.encode("fellow")
    assert [tok.decoder[i] for i in ids] == ["f", "e", "ll", "o", "w</w>"]
    assert tok.decode(ids) == "fellow"


def test_tokenize_pad_truncate_mask():
    tok = ClipBPETokenizer()
    out = tokenize(["hi", "a much longer caption string"], context_length=8,
                   tokenizer=tok)
    assert out["token"].shape == (2, 8)
    assert out["mask"].shape == (2, 8)
    # row 0: sot + 2 byte-tokens + eot = 4 real tokens
    assert out["mask"][0].sum() == 4
    assert out["token"][0][0] == tok.sot_token
    # truncation keeps the eot as last token (reference clip.py:200-204)
    long = tokenize(["x" * 300], context_length=8, tokenizer=tok)
    assert long["token"][0, -1] == tok.eot_token
    assert long["mask"][0].all()


def test_tokenize_wrapper():
    w = Tokenize(context_length=12)
    out = w.get_tokens("a test")
    assert out["token"].shape == (1, 12)
    jt = Tokenize(context_length=12, just_token=True).get_tokens("a test")
    assert isinstance(jt, list) and isinstance(jt[0], list)


# ---------------------------------------------------------- model parity

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from dynamicvectorquantization_tpu.nn.clip_text import (  # noqa: E402
    CLIPTextTransformer,
    quick_gelu,
)
from dynamicvectorquantization_tpu.utils.torch_ckpt import (  # noqa: E402
    convert_clip_text_state_dict,
)

W, LAYERS, HEADS, VOCAB, CTX, EMB = 32, 2, 4, 100, 16, 24


class TQuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TBlock(tnn.Module):
    def __init__(self, w, heads, mask):
        super().__init__()
        self.attn = tnn.MultiheadAttention(w, heads)
        self.ln_1 = tnn.LayerNorm(w)
        from collections import OrderedDict

        self.mlp = tnn.Sequential(OrderedDict([
            ("c_fc", tnn.Linear(w, w * 4)),
            ("gelu", TQuickGELU()),
            ("c_proj", tnn.Linear(w * 4, w)),
        ]))
        self.ln_2 = tnn.LayerNorm(w)
        self.attn_mask = mask

    def forward(self, x):
        a = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                      need_weights=False, attn_mask=self.attn_mask)[0]
        x = x + a
        return x + self.mlp(self.ln_2(x))


class TTextTower(tnn.Module):
    def __init__(self):
        super().__init__()
        mask = torch.full((CTX, CTX), float("-inf")).triu_(1)
        self.token_embedding = tnn.Embedding(VOCAB, W)
        self.positional_embedding = tnn.Parameter(torch.randn(CTX, W) * 0.01)
        blocks = [TBlock(W, HEADS, mask) for _ in range(LAYERS)]
        self.transformer = tnn.ModuleDict(
            {"resblocks": tnn.Sequential(*blocks)}
        )
        self.ln_final = tnn.LayerNorm(W)
        self.text_projection = tnn.Parameter(torch.randn(W, EMB) * W ** -0.5)

    def forward(self, text):
        x = self.token_embedding(text) + self.positional_embedding[: text.shape[1]]
        x = x.permute(1, 0, 2)  # NLD -> LND (reference runs seq-major)
        x = self.transformer["resblocks"](x)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), text.argmax(dim=-1)] @ self.text_projection
        return x, pooled


def test_clip_text_parity():
    torch.manual_seed(0)
    tm = TTextTower().eval()
    tokens = torch.randint(1, VOCAB - 1, (3, CTX))
    # plant a distinct highest token (the "eot") per row for argmax pooling
    tokens[0, 5] = VOCAB - 1
    tokens[1, CTX - 1] = VOCAB - 1
    tokens[2, 2] = VOCAB - 1
    with torch.no_grad():
        ref_seq, ref_pooled = tm(tokens)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_clip_text_state_dict(sd)
    model = CLIPTextTransformer(vocab_size=VOCAB, context_length=CTX, width=W,
                                layers=LAYERS, heads=HEADS, embed_dim=EMB)
    seq, pooled = model.apply(variables, jnp.asarray(tokens.numpy()))
    np.testing.assert_allclose(np.asarray(seq), ref_seq.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_quick_gelu():
    x = jnp.linspace(-3, 3, 7)
    tx = torch.linspace(-3, 3, 7)
    np.testing.assert_allclose(
        np.asarray(quick_gelu(x)),
        (tx * torch.sigmoid(1.702 * tx)).numpy(), rtol=1e-6,
    )


def test_clip_text_embedding_wrapper():
    from dynamicvectorquantization_tpu.nn.clip_text import CLIPTextEmbedding

    emb = CLIPTextEmbedding.__new__(CLIPTextEmbedding)
    # build the wrapper around a tiny tower without the 38M-param default
    emb.model = CLIPTextTransformer(vocab_size=VOCAB, context_length=CTX,
                                    width=W, layers=LAYERS, heads=HEADS,
                                    embed_dim=EMB)
    emb.normalize = True
    emb.pick_last_embedding = True
    emb.keep_seq_len_dim = True
    emb.additional_last_embedding = False
    emb._double = False
    emb.embed_dim = EMB
    emb.variables = emb.model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CTX), jnp.int32)
    )
    emb._apply = jax.jit(emb.model.apply)
    toks = np.random.default_rng(0).integers(-2, VOCAB, (2, CTX))
    out = emb(toks)  # negative tokens must be clamped, not crash
    assert out.shape == (2, 1, EMB)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5
    )


@pytest.mark.slow
def test_native_clip_text_encoder_interface():
    from dynamicvectorquantization_tpu.nn.text_encoders import NativeCLIPTextEncoder

    enc = NativeCLIPTextEncoder(max_length=16)
    feats, mask = enc.encode_text(["a red cat", "hello"])
    assert feats.shape == (2, 16, 512)
    assert mask.shape == (2, 16)
    assert float(mask[0].sum()) >= 4  # sot + tokens + eot
    # deterministic under the seeded random tower
    feats2, _ = enc.encode_text(["a red cat", "hello"])
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))
