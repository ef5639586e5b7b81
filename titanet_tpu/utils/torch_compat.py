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
