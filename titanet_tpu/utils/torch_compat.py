"""Convert reference (Wadaboa/titanet) torch checkpoints to our pytrees.

The reference saves ``model.state_dict()`` checkpoints
(``/root/reference/src/learn.py:188-199``); users migrating to this framework
can load their existing ``.pth`` files through :func:`load_reference_checkpoint`.
The same mapping powers our golden parity tests (tests/test_titanet_parity.py).

Layout conversions:
- torch Conv1d weight ``[out, in/groups, K]`` -> WIO ``[K, in/groups, out]``
- torch Linear weight ``[out, in]``           -> ``[in, out]``
- BatchNorm running_mean/var                  -> ``batch_stats`` collection

No torch import is required if the state dict is already numpy-valued.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(x):
    if isinstance(x, np.ndarray):
        return x
    try:  # torch tensor
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def _conv(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _linear(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix):
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def convert_titanet_state_dict(sd: Dict) -> Tuple[Dict, Dict]:
    """Reference ``TitaNet.state_dict()`` -> ``(params, batch_stats)`` pytrees.

    Reference module paths (src/models.py:342-584, src/modules.py):
      encoder.prolog.conv_block.{0=conv,1=bn}
      encoder.mega_blocks.{i}.sub_blocks.{j}.conv_block.{0=dwconv,1=bn}   j<n_sub
      encoder.mega_blocks.{i}.sub_blocks.{n_sub}.excitation.{0,2}        (SE)
      encoder.mega_blocks.{i}.skip_connection.{0=conv,1=bn}
      encoder.epilog.conv_block.{0=conv,1=bn}
      decoder.pool.0.{in_linear,out_linear} ; decoder.pool.1 (bn)
      decoder.linear.{0=linear,1=bn}
    """
    params: Dict = {"encoder": {}, "decoder": {}}
    stats: Dict = {"encoder": {}, "decoder": {}}

    def conv_block(tprefix, depthwise):
        p, s = {}, {}
        if depthwise:
            p["conv"] = {
                "depthwise": _conv(sd, f"{tprefix}.conv_block.0.conv.0"),
                "pointwise": _conv(sd, f"{tprefix}.conv_block.0.conv.1"),
            }
        else:
            p["conv"] = _conv(sd, f"{tprefix}.conv_block.0")
        p["norm"], s["norm"] = _bn(sd, f"{tprefix}.conv_block.1")
        return p, s

    params["encoder"]["prolog"], stats["encoder"]["prolog"] = conv_block(
        "encoder.prolog", depthwise=False
    )
    params["encoder"]["epilog"], stats["encoder"]["epilog"] = conv_block(
        "encoder.epilog", depthwise=False
    )

    # discover mega-block and sub-block counts from the keys
    mega_ids = sorted(
        {
            int(k.split(".")[2])
            for k in sd
            if k.startswith("encoder.mega_blocks.")
        }
    )
    for i in mega_ids:
        base = f"encoder.mega_blocks.{i}"
        sub_ids = sorted(
            {
                int(k.split(".")[4])
                for k in sd
                if k.startswith(f"{base}.sub_blocks.") and "conv_block" in k
            }
        )
        mp: Dict = {}
        ms: Dict = {}
        for j in sub_ids:
            mp[f"sub_block_{j}"], ms[f"sub_block_{j}"] = conv_block(
                f"{base}.sub_blocks.{j}", depthwise=True
            )
        se_idx = len(sub_ids)
        mp["se"] = {
            "fc1": _linear(sd, f"{base}.sub_blocks.{se_idx}.excitation.0"),
            "fc2": _linear(sd, f"{base}.sub_blocks.{se_idx}.excitation.2"),
        }
        mp["skip_conv"] = _conv(sd, f"{base}.skip_connection.0")
        mp["skip_norm"], ms["skip_norm"] = _bn(sd, f"{base}.skip_connection.1")
        params["encoder"][f"mega_block_{i}"] = mp
        stats["encoder"][f"mega_block_{i}"] = ms

    if "decoder.pool.0.in_linear.weight" in sd:  # attentive pooling
        params["decoder"]["pool"] = {
            "in_linear": _linear(sd, "decoder.pool.0.in_linear"),
            "out_linear": _linear(sd, "decoder.pool.0.out_linear"),
        }
        params["decoder"]["pool_norm"], stats["decoder"]["pool_norm"] = _bn(
            sd, "decoder.pool.1"
        )
    else:  # simple pool: AdaptiveAvgPool1d, Squeeze, Linear
        params["decoder"]["pool"] = {"linear": _linear(sd, "decoder.pool.2")}
    params["decoder"]["linear"] = _linear(sd, "decoder.linear.0")
    params["decoder"]["linear_norm"], stats["decoder"]["linear_norm"] = _bn(
        sd, "decoder.linear.1"
    )
    return params, stats


def convert_dvector_state_dict(sd: Dict) -> Dict:
    """Reference ``DVectorBaseline.state_dict()`` (src/models.py:70-159)
    -> our :class:`titanet_tpu.models.DVectorBaseline` params.

    torch LSTM packs gates (i, f, g, o) into ``weight_ih_l{k} [4H, in]`` /
    ``weight_hh_l{k} [4H, H]`` with two bias vectors that are summed at
    runtime; flax's LSTMCell keeps per-gate kernels (input kernels bias-free,
    hidden kernels carrying the combined bias).
    """
    params: Dict = {}
    layer = 0
    while f"recurrent.weight_ih_l{layer}" in sd:
        w_ih = _np(sd[f"recurrent.weight_ih_l{layer}"])  # [4H, in]
        w_hh = _np(sd[f"recurrent.weight_hh_l{layer}"])  # [4H, H]
        b = _np(sd[f"recurrent.bias_ih_l{layer}"]) + _np(
            sd[f"recurrent.bias_hh_l{layer}"]
        )
        h = w_hh.shape[1]
        gates = {"i": 0, "f": 1, "g": 2, "o": 3}
        cell: Dict = {}
        for name, gi in gates.items():
            sl = slice(gi * h, (gi + 1) * h)
            cell[f"i{name}"] = {"kernel": w_ih[sl].T}
            cell[f"h{name}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
        params[f"lstm_{layer}"] = cell
        layer += 1
    params["projection"] = _linear(sd, "projection")
    return params


def convert_head_state_dict(sd: Dict):
    """Extract classification-head params when the checkpoint has them.

    The reference registers the loss module as a model attribute, so its
    ``state_dict`` includes ``loss_function.*`` keys (CE: fc.weight+bias;
    angular: fc.weight; GE2E: w, b). Returns a params dict matching
    :mod:`titanet_tpu.losses.heads` layouts, or None.
    """
    if "loss_function.fc.weight" in sd:
        if "loss_function.fc.bias" in sd:  # CEHead
            return {"fc": _linear(sd, "loss_function.fc")}
        return {"weight": _np(sd["loss_function.fc.weight"]).T}  # angular
    if "loss_function.w" in sd:  # GE2E
        return {"w": _np(sd["loss_function.w"]), "b": _np(sd["loss_function.b"])}
    return None


def load_reference_checkpoint(
    path: str, with_head: bool = False, scan_blocks: bool = False
):
    """Load a reference ``.pth`` checkpoint file (requires torch).

    Returns ``(params, batch_stats)``, or ``(params, batch_stats, head)``
    with ``with_head=True`` (head is None when the checkpoint was saved
    without a loss module). ``scan_blocks=True`` restacks the mega-block
    subtrees for a ``TitaNet(scan_blocks=True)`` model (the block count is
    inferred from the checkpoint).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    params, stats = convert_titanet_state_dict(sd)
    if scan_blocks:
        from titanet_tpu.models.titanet import stack_mega_block_params

        n = sum(k.startswith("mega_block_") for k in params["encoder"])
        params = stack_mega_block_params(params, n)
        stats = stack_mega_block_params(stats, n)
    if with_head:
        return params, stats, convert_head_state_dict(sd)
    return params, stats


# ---------------------------------------------------------------------------
# Reverse direction: titanet_tpu pytrees -> reference torch state dict
# ---------------------------------------------------------------------------


def _inv_conv(dst, prefix, p):
    dst[f"{prefix}.weight"] = _np(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        dst[f"{prefix}.bias"] = _np(p["bias"])


def _inv_linear(dst, prefix, p):
    dst[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        dst[f"{prefix}.bias"] = _np(p["bias"])


def _inv_bn(dst, prefix, p, s):
    dst[f"{prefix}.weight"] = _np(p["scale"])
    dst[f"{prefix}.bias"] = _np(p["bias"])
    dst[f"{prefix}.running_mean"] = _np(s["mean"])
    dst[f"{prefix}.running_var"] = _np(s["var"])
    # torch BatchNorm1d state dicts carry this buffer; strict loads want it
    dst[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_titanet_state_dict(params: Dict, batch_stats: Dict) -> Dict:
    """Inverse of :func:`convert_titanet_state_dict`: our ``(params,
    batch_stats)`` pytrees -> a numpy-valued dict keyed exactly like the
    reference ``TitaNet.state_dict()`` (src/models.py:342-584 module
    paths), so a reference user can ``model.load_state_dict`` weights
    trained here. Accepts either the unrolled or the ``scan_blocks``
    (stacked) mega-block layout."""
    if "mega_blocks" in params.get("encoder", {}):
        from titanet_tpu.models.titanet import unstack_mega_block_params

        params = unstack_mega_block_params(params)
        batch_stats = unstack_mega_block_params(batch_stats)

    sd: Dict = {}

    def conv_block(tprefix, p, s, depthwise):
        if depthwise:
            _inv_conv(sd, f"{tprefix}.conv_block.0.conv.0", p["conv"]["depthwise"])
            _inv_conv(sd, f"{tprefix}.conv_block.0.conv.1", p["conv"]["pointwise"])
        else:
            _inv_conv(sd, f"{tprefix}.conv_block.0", p["conv"])
        _inv_bn(sd, f"{tprefix}.conv_block.1", p["norm"], s["norm"])

    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    conv_block("encoder.prolog", enc_p["prolog"], enc_s["prolog"], False)
    conv_block("encoder.epilog", enc_p["epilog"], enc_s["epilog"], False)
    mega_ids = sorted(
        int(k.split("_")[-1]) for k in enc_p if k.startswith("mega_block_")
    )
    for i in mega_ids:
        base = f"encoder.mega_blocks.{i}"
        mp, ms = enc_p[f"mega_block_{i}"], enc_s[f"mega_block_{i}"]
        sub_ids = sorted(
            int(k.split("_")[-1]) for k in mp if k.startswith("sub_block_")
        )
        for j in sub_ids:
            conv_block(
                f"{base}.sub_blocks.{j}", mp[f"sub_block_{j}"],
                ms[f"sub_block_{j}"], True,
            )
        se_idx = len(sub_ids)
        _inv_linear(sd, f"{base}.sub_blocks.{se_idx}.excitation.0", mp["se"]["fc1"])
        _inv_linear(sd, f"{base}.sub_blocks.{se_idx}.excitation.2", mp["se"]["fc2"])
        _inv_conv(sd, f"{base}.skip_connection.0", mp["skip_conv"])
        _inv_bn(sd, f"{base}.skip_connection.1", mp["skip_norm"], ms["skip_norm"])

    dec_p, dec_s = params["decoder"], batch_stats["decoder"]
    if "in_linear" in dec_p["pool"]:  # attentive pooling
        _inv_linear(sd, "decoder.pool.0.in_linear", dec_p["pool"]["in_linear"])
        _inv_linear(sd, "decoder.pool.0.out_linear", dec_p["pool"]["out_linear"])
        _inv_bn(sd, "decoder.pool.1", dec_p["pool_norm"], dec_s["pool_norm"])
    else:  # simple pool
        _inv_linear(sd, "decoder.pool.2", dec_p["pool"]["linear"])
    _inv_linear(sd, "decoder.linear.0", dec_p["linear"])
    _inv_bn(sd, "decoder.linear.1", dec_p["linear_norm"], dec_s["linear_norm"])
    return sd


def export_head_state_dict(head_name: str, head_params: Dict) -> Dict:
    """Our head params -> reference ``loss_function.*`` keys
    (src/losses.py: CE fc.weight+bias, angular fc.weight, GE2E w/b)."""
    sd: Dict = {}
    if head_name == "ce":
        _inv_linear(sd, "loss_function.fc", head_params["fc"])
    elif head_name in ("arc", "cos", "sphere"):
        sd["loss_function.fc.weight"] = _np(head_params["weight"]).T
    elif head_name == "ge2e":
        sd["loss_function.w"] = _np(head_params["w"])
        sd["loss_function.b"] = _np(head_params["b"])
    else:
        raise ValueError(f"unknown head {head_name!r}")
    return sd


def save_reference_checkpoint(
    path: str,
    params: Dict,
    batch_stats: Dict,
    head_name: str = None,
    head_params: Dict = None,
    epoch: int = 0,
):
    """Write a reference-format ``.pth`` checkpoint (the exact layout
    learn.py:188-199 saves: model / optimizer / lr_scheduler / epoch), so
    migration works in BOTH directions (docs/MIGRATION.md). Optimizer and
    scheduler slots are left empty — the reference's own resume path
    tolerates that for inference/fine-tune restarts."""
    import torch

    sd = export_titanet_state_dict(params, batch_stats)
    if head_name is not None and head_params is not None:
        sd.update(export_head_state_dict(head_name, head_params))
    blob = {
        "model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        "optimizer": dict(),
        "lr_scheduler": dict(),
        "epoch": int(epoch),
    }
    torch.save(blob, path)
