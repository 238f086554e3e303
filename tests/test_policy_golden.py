"""Policy-network goldens vs the torch reference, all three head families.

Complements the TTT rollout golden (COM+LSTM end-to-end): ports torch
weights (conv OIHW→HWIO, LSTM gate repacking, transformer packed-qkv
splits) into the flax ``PolicyNet`` and asserts output parity over three
sequential calls with threaded recurrent state — covering the CNN
encoder, the LSTM head, the transformer head (post-LN, residual ``hx``
chaining, ref ``train_with_env.py:96-103,145-153``), the MLP head, and
the in-net normalize of the standard policy.

Goldens: ``scripts/capture_policy_goldens.py``.
"""

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doodle_tpu.models.policy import PolicyNet

GOLD_DIR = pathlib.Path(__file__).parent / "goldens"

N, B, K, RES = 5, 3, 2, 24
ENC, LSTM_HID, HEADS, LAYERS = 32, 16, 4, 2
CALLS = 3

pytestmark = pytest.mark.skipif(
    not (GOLD_DIR / "policy_lstm.npz").exists(),
    reason="run scripts/capture_policy_goldens.py first",
)


def _w(g):
    return {k[len("w__"):]: v for k, v in g.items() if k.startswith("w__")}


def port_cnn_encoder(w):
    """torch CNNEncoder (train_with_env.py:39-55) → flax CNNEncoder_0."""
    def conv(i):
        k = w[f"encoder__cnn__{i}__weight"]       # [O, I, 5, 5]
        return {
            "kernel": np.ascontiguousarray(k.transpose(2, 3, 1, 0)),
            "bias": w[f"encoder__cnn__{i}__bias"],
        }
    return {
        "Conv_0": conv(0), "Conv_1": conv(3), "Conv_2": conv(6),
        "Dense_0": {
            "kernel": w["encoder__proj__weight"].T,
            "bias": w["encoder__proj__bias"],
        },
    }


def port_lstm(w, H):
    def gate(mat, i):
        return np.ascontiguousarray(mat[i * H:(i + 1) * H].T)
    wi, wh = w["rnn__weight_ih_l0"], w["rnn__weight_hh_l0"]
    b = w["rnn__bias_ih_l0"] + w["rnn__bias_hh_l0"]
    out = {}
    for i, name in enumerate("ifgo"):
        out["i" + name] = {"kernel": gate(wi, i)}
        out["h" + name] = {"kernel": gate(wh, i),
                           "bias": b[i * H:(i + 1) * H]}
    return out


def port_transformer_layer(w, li, d, heads):
    """torch TransformerEncoderLayer (packed qkv) → flax layer params."""
    hd = d // heads
    pre = f"transformer__layers__{li}__"
    inw = w[pre + "self_attn__in_proj_weight"]     # [3d, d]
    inb = w[pre + "self_attn__in_proj_bias"]       # [3d]

    def proj(i):
        Wp = inw[i * d:(i + 1) * d]                # [d, d]; y = x @ Wp.T
        bp = inb[i * d:(i + 1) * d]
        return {
            "kernel": np.ascontiguousarray(Wp.T).reshape(d, heads, hd),
            "bias": bp.reshape(heads, hd),
        }

    ow = w[pre + "self_attn__out_proj__weight"]    # [d, d]
    return {
        "MultiHeadDotProductAttention_0": {
            "query": proj(0), "key": proj(1), "value": proj(2),
            "out": {
                "kernel": np.ascontiguousarray(ow.T).reshape(heads, hd, d),
                "bias": w[pre + "self_attn__out_proj__bias"],
            },
        },
        "LayerNorm_0": {"scale": w[pre + "norm1__weight"],
                        "bias": w[pre + "norm1__bias"]},
        "Dense_0": {"kernel": w[pre + "linear1__weight"].T,
                    "bias": w[pre + "linear1__bias"]},
        "Dense_1": {"kernel": w[pre + "linear2__weight"].T,
                    "bias": w[pre + "linear2__bias"]},
        "LayerNorm_1": {"scale": w[pre + "norm2__weight"],
                        "bias": w[pre + "norm2__bias"]},
    }


def port_head(w):
    return {
        "LayerNorm_0": {"scale": w["head__0__weight"],
                        "bias": w["head__0__bias"]},
        "Dense_0": {"kernel": w["head__1__weight"].T,
                    "bias": w["head__1__bias"]},
        "Dense_1": {"kernel": w["head__4__weight"].T,
                    "bias": w["head__4__bias"]},
    }


def build(arch, g):
    w = _w(g)
    policy = PolicyNet(
        num_heliostats=N, enc_dim=ENC, lstm_hid=LSTM_HID,
        transformer_layers=LAYERS, transformer_heads=HEADS,
        architecture=arch, encoder="cnn", dropout=0.0,
    )
    tree = {"CNNEncoder_0": port_cnn_encoder(w), **port_head(w)}
    if arch == "lstm":
        tree["OptimizedLSTMCell_0"] = port_lstm(w, LSTM_HID)
    elif arch == "transformer":
        for li in range(LAYERS):
            tree[f"TransformerEncoderLayer_{li}"] = port_transformer_layer(
                w, li, ENC, HEADS
            )
    params = {"params": jax.tree.map(jnp.asarray, tree)}
    return policy, params


@pytest.mark.parametrize("arch", ["lstm", "transformer", "mlp"])
def test_policy_matches_reference(arch):
    g = dict(np.load(GOLD_DIR / f"policy_{arch}.npz"))
    policy, params = build(arch, g)
    carry = policy.init_carry(B)
    for c in range(CALLS):
        img = g[f"in_img_{c}"][:, :, 0]            # torch (B,K,1,H,W)
        out, carry = policy.apply(
            params, jnp.asarray(img), jnp.asarray(g[f"in_aux_{c}"]),
            carry, deterministic=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), g[f"out_{c}"], rtol=2e-4, atol=2e-5,
            err_msg=f"{arch} call {c}",
        )
        if arch == "lstm":
            c_flax, h_flax = carry     # flax carry = (c, h)
            np.testing.assert_allclose(
                np.asarray(h_flax), g[f"hx_h_{c}"][0], rtol=2e-4, atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(c_flax), g[f"hx_c_{c}"][0], rtol=2e-4, atol=2e-5
            )
        elif arch == "transformer":
            np.testing.assert_allclose(
                np.asarray(carry), g[f"hx_{c}"], rtol=2e-4, atol=2e-5
            )
