"""PyTorch-checkpoint → Flax parameter conversion.

Enables loading checkpoints trained with the reference framework
(layer names from ``imagevae/mnist_vae.py``, ``imagevae/dsprites_vae.py``,
``measurevae/encoder.py``, ``measurevae/decoder.py``) into the Flax
models here. Handles:

- conv kernels: torch OIHW → flax HWIO;
- transposed-conv kernels: torch IOHW → the padded-Conv formulation the
  Flax MnistVAE decoder uses (spatially rotated 180°, in/out swapped),
  and flax ConvTranspose layout (HWIO) for the dSprites decoder;
- linear weights: (out, in) → (in, out);
- GRU weights: torch ``weight_ih_l{k}[_reverse]`` (3H, I) → our
  ``w_ih`` (I, 3H), same (r, z, n) gate order.

Input is a plain ``{name: np.ndarray}`` mapping — call
``torch_state_dict_to_numpy`` on a loaded ``state_dict`` first, so the
converter itself has no torch dependency.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v) for k, v in state_dict.items()}


def _linear(sd, prefix):
    return {
        "kernel": sd[f"{prefix}.weight"].T,
        "bias": sd[f"{prefix}.bias"],
    }


def _chw_to_hwc_perm(c: int, h: int, w: int) -> np.ndarray:
    """Index permutation taking a torch (C,H,W)-flattened vector to the
    (H,W,C) flattening the Flax models use."""
    idx = np.arange(c * h * w).reshape(c, h, w)
    return np.transpose(idx, (1, 2, 0)).reshape(-1)


def _linear_flatten_in(sd, prefix, c, h, w):
    """Linear consuming a flattened conv map: reorder input rows
    CHW→HWC."""
    k = sd[f"{prefix}.weight"].T  # (in, out)
    return {
        "kernel": k[_chw_to_hwc_perm(c, h, w), :],
        "bias": sd[f"{prefix}.bias"],
    }


def _linear_flatten_out(sd, prefix, c, h, w):
    """Linear producing a flattened conv map: reorder output columns
    CHW→HWC."""
    k = sd[f"{prefix}.weight"].T
    perm = _chw_to_hwc_perm(c, h, w)
    return {
        "kernel": k[:, perm],
        "bias": sd[f"{prefix}.bias"][perm],
    }


def _conv(sd, prefix):
    # torch Conv2d weight: (O, I, H, W) -> flax (H, W, I, O)
    w = sd[f"{prefix}.weight"]
    return {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": sd[f"{prefix}.bias"],
    }


def _convtranspose_as_padded_conv(sd, prefix):
    # torch ConvTranspose2d weight: (I, O, H, W). A stride-1 transposed
    # conv equals pad(K-1) + correlation with the 180°-rotated kernel:
    # flax kernel[h, w, i, o] = W_t[i, o, K-1-h, K-1-w]
    w = sd[f"{prefix}.weight"]
    w = w[:, :, ::-1, ::-1]
    return {
        "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
        "bias": sd[f"{prefix}.bias"],
    }


def _convtranspose(sd, prefix):
    # flax ConvTranspose(transpose_kernel=False) correlates with the
    # kernel directly, whereas torch's ConvTranspose2d is the conv
    # adjoint — so the torch (I, O, H, W) kernel must be spatially
    # rotated 180° and laid out (H, W, I, O). Verified numerically
    # (SAME padding == torch padding=1 for k4 s2).
    w = sd[f"{prefix}.weight"][:, :, ::-1, ::-1]
    return {
        "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))),
        "bias": sd[f"{prefix}.bias"],
    }


def _gru(sd, prefix, num_layers, bidirectional):
    out: List[Any] = []
    for layer in range(num_layers):
        per_dir = []
        for d in range(2 if bidirectional else 1):
            sfx = f"_l{layer}" + ("_reverse" if d == 1 else "")
            per_dir.append({
                "w_ih": sd[f"{prefix}.weight_ih{sfx}"].T,
                "w_hh": sd[f"{prefix}.weight_hh{sfx}"].T,
                "b_ih": sd[f"{prefix}.bias_ih{sfx}"],
                "b_hh": sd[f"{prefix}.bias_hh{sfx}"],
            })
        out.append(per_dir if bidirectional else per_dir[0])
    return out


# ---------------------------------------------------------------------------
# Image VAEs
# ---------------------------------------------------------------------------


def convert_mnist_vae(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference MnistVAE state_dict → Flax MnistVAE params.

    Reference sequential indices (mnist_vae.py:16-47): enc_conv 0/3/6,
    enc_lin 0, dec_lin 0/2, dec_conv 0/3/6 (ConvTranspose).
    """
    return {
        "enc_convs_0": _conv(sd, "enc_conv.0"),
        "enc_convs_1": _conv(sd, "enc_conv.3"),
        "enc_convs_2": _conv(sd, "enc_conv.6"),
        "enc_dense": _linear_flatten_in(sd, "enc_lin.0", 8, 19, 19),
        "enc_mean": _linear(sd, "enc_mean"),
        "enc_log_std": _linear(sd, "enc_log_std"),
        "dec_denses_0": _linear(sd, "dec_lin.0"),
        "dec_denses_1": _linear_flatten_out(sd, "dec_lin.2", 8, 19, 19),
        "dec_convs_0": _convtranspose_as_padded_conv(sd, "dec_conv.0"),
        "dec_convs_1": _convtranspose_as_padded_conv(sd, "dec_conv.3"),
        "dec_convs_2": _convtranspose_as_padded_conv(sd, "dec_conv.6"),
    }


def convert_dsprites_vae(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference DspritesVAE state_dict → Flax DspritesVAE params.

    Reference sequential indices (dsprites_vae.py:12-46): enc_conv
    0/2/4/6, enc_lin 0/2, dec_lin 0/2/4, dec_conv 0/2/4/6.
    """
    return {
        "enc_convs_0": _conv(sd, "enc_conv.0"),
        "enc_convs_1": _conv(sd, "enc_conv.2"),
        "enc_convs_2": _conv(sd, "enc_conv.4"),
        "enc_convs_3": _conv(sd, "enc_conv.6"),
        "enc_denses_0": _linear_flatten_in(sd, "enc_lin.0", 32, 4, 4),
        "enc_denses_1": _linear(sd, "enc_lin.2"),
        "enc_mean": _linear(sd, "enc_mean"),
        "enc_log_std": _linear(sd, "enc_log_std"),
        "dec_denses_0": _linear(sd, "dec_lin.0"),
        "dec_denses_1": _linear(sd, "dec_lin.2"),
        "dec_denses_2": _linear_flatten_out(sd, "dec_lin.4", 32, 4, 4),
        "dec_convs_0": _convtranspose(sd, "dec_conv.0"),
        "dec_convs_1": _convtranspose(sd, "dec_conv.2"),
        "dec_convs_2": _convtranspose(sd, "dec_conv.4"),
        "dec_convs_3": _convtranspose(sd, "dec_conv.6"),
    }


# ---------------------------------------------------------------------------
# MeasureVAE
# ---------------------------------------------------------------------------


def convert_measure_vae(
    sd: Dict[str, np.ndarray], num_layers: int = 2
) -> Dict[str, Any]:
    """Reference MeasureVAE state_dict → Flax MeasureVAE params.

    Reference names: encoder.* (encoder.py:27-51) and decoder.*
    (decoder.py:331-368); sequential heads are Linear/SELU/Linear.
    """
    encoder = {
        "embedding": sd["encoder.note_embedding_layer.weight"],
        "gru": _gru(sd, "encoder.lstm", num_layers, bidirectional=True),
        "mean1_w": sd["encoder.linear_mean.0.weight"].T,
        "mean1_b": sd["encoder.linear_mean.0.bias"],
        "mean2_w": sd["encoder.linear_mean.2.weight"].T,
        "mean2_b": sd["encoder.linear_mean.2.bias"],
        "std1_w": sd["encoder.linear_log_std.0.weight"].T,
        "std1_b": sd["encoder.linear_log_std.0.bias"],
        "std2_w": sd["encoder.linear_log_std.2.weight"].T,
        "std2_b": sd["encoder.linear_log_std.2.bias"],
    }
    decoder = {
        "embedding": sd["decoder.note_embedding_layer.weight"],
        "z2beat_w": sd["decoder.z_to_beat_rnn_input.0.weight"].T,
        "z2beat_b": sd["decoder.z_to_beat_rnn_input.0.bias"],
        "b_0": sd["decoder.b_0"],
        "beat_gru": _gru(sd, "decoder.rnn_beat", num_layers, False),
        "beat2tickh_w": sd["decoder.beat_emb_to_tick_rnn_hidden.0.weight"].T,
        "beat2tickh_b": sd["decoder.beat_emb_to_tick_rnn_hidden.0.bias"],
        "beat2ticki_w": sd["decoder.beat_emb_to_tick_rnn_input.0.weight"].T,
        "beat2ticki_b": sd["decoder.beat_emb_to_tick_rnn_input.0.bias"],
        "x_0": sd["decoder.x_0"],
        "tick_gru": _gru(sd, "decoder.rnn_tick", num_layers, False),
        "out_w": sd["decoder.tick_emb_to_note_emb.0.weight"].T,
        "out_b": sd["decoder.tick_emb_to_note_emb.0.bias"],
    }
    return {"encoder": encoder, "decoder": decoder}
