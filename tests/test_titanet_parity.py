"""Golden parity: our TitaNet vs the reference torch implementation.

Imports the reference model code directly from /root/reference/src (read-only;
models/modules/losses are torch-only and import cleanly), copies its weights
into our pytrees via the checkpoint converter, and compares outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from titanet_tpu.models import TitaNet, count_params, get_titanet, l2_normalize
from titanet_tpu.utils.torch_compat import convert_titanet_state_dict


@pytest.fixture(scope="module")
def ref_models(reference_src):
    import models as ref_models  # noqa: F401 (from /root/reference/src)

    return ref_models


def _make_pair(ref_models, n_mega_blocks=2, hidden=64, n_mels=80, out=96, emb=32):
    torch.manual_seed(0)
    tmodel = ref_models.TitaNet(
        n_mels=n_mels,
        n_mega_blocks=n_mega_blocks,
        n_sub_blocks=3,
        encoder_hidden_size=hidden,
        encoder_output_size=out,
        embedding_size=emb,
        mega_block_kernel_size=3,
        attention_hidden_size=16,
        dropout=0.0,
    )
    tmodel.eval()
    jmodel = TitaNet(
        n_mega_blocks=n_mega_blocks,
        n_sub_blocks=3,
        encoder_hidden_size=hidden,
        encoder_output_size=out,
        embedding_size=emb,
        mega_block_kernel_size=3,
        attention_hidden_size=16,
        dropout=0.0,
    )
    params, stats = convert_titanet_state_dict(tmodel.state_dict())
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    return tmodel, jmodel, variables


def test_titanet_forward_matches_reference(ref_models):
    tmodel, jmodel, variables = _make_pair(ref_models)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 80, 57)).astype(np.float32)  # [B, M, T] torch layout

    with torch.no_grad():
        ref_emb = tmodel(torch.from_numpy(x)).numpy()  # normalized (inference mode)

    out = jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)), train=False)
    ours = np.asarray(l2_normalize(out))
    np.testing.assert_allclose(ours, ref_emb, rtol=1e-4, atol=1e-5)

    # cosine drift — the headline parity budget is <1e-3 (BASELINE.md)
    cos = (ours * ref_emb).sum(-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine drift too high: {1 - cos}"


def test_titanet_scan_layout_torch_import_parity(ref_models):
    """Reference torch weights -> converter -> stack -> scan_blocks model:
    the full import path into the scanned layout stays within parity budget."""
    from titanet_tpu.models import stack_mega_block_params

    tmodel, jmodel, variables = _make_pair(ref_models)
    smodel = jmodel.clone(scan_blocks=True)
    svars = {k: stack_mega_block_params(variables[k], 2) for k in variables}
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 80, 57)).astype(np.float32)
    with torch.no_grad():
        ref_emb = tmodel(torch.from_numpy(x)).numpy()
    out = smodel.apply(svars, jnp.asarray(x.transpose(0, 2, 1)), train=False)
    ours = np.asarray(l2_normalize(out))
    cos = (ours * ref_emb).sum(-1)
    assert np.all(1.0 - cos < 1e-5), f"cosine drift too high: {1 - cos}"


def test_titanet_param_counts_match_reference(ref_models):
    # exact per-architecture param-count equality with the reference builder
    for size, hidden, kernel in [("s", 256, 3)]:
        tmodel = ref_models.TitaNet(
            n_mels=80,
            n_mega_blocks=17,
            n_sub_blocks=3,
            encoder_hidden_size=hidden,
            encoder_output_size=1536,
            embedding_size=192,
            mega_block_kernel_size=kernel,
        )
        ref_count = int(tmodel.get_n_params())
        jmodel = get_titanet(model_size=size, n_mega_blocks=17)
        assert count_params(jmodel) == ref_count


def test_titanet_paper_param_targets():
    # paper targets (src/models.py:173): S/M/L = 6.4/13.4/25.3 M.
    # get_titanet with n_mega_blocks=None runs the search (src/models.py:230-260).
    for size, target in [("s", 6.4), ("m", 13.4), ("l", 25.3)]:
        model = get_titanet(model_size=size)  # auto n_mega_blocks search
        params_m = count_params(model) / 1e6
        assert abs(params_m - target) / target < 0.05, (size, params_m)


def test_titanet_batch_independence():
    """Gradient-dependency check (reference chart_dependencies,
    src/utils.py:451-468): one batch element's embedding must not depend on
    other elements' inputs in eval mode."""
    model = TitaNet(n_mega_blocks=1, encoder_hidden_size=32, encoder_output_size=48,
                    embedding_size=16, attention_hidden_size=8, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 20, 80)), jnp.float32)
    variables = model.init(jax.random.key(0), x)

    def single_out(inputs):
        return model.apply(variables, inputs, train=False)[2].sum()

    g = jax.grad(single_out)(x)
    g = np.asarray(g)
    assert np.abs(g[2]).max() > 0
    others = np.abs(np.delete(g, 2, axis=0)).max()
    assert others == 0.0, f"cross-batch leakage: {others}"


def test_closed_form_param_count_matches_traced():
    from titanet_tpu.models.titanet import _SIZE_PRESETS, titanet_param_count

    for size, n_mega in [("s", 3), ("m", 2), ("l", 1)]:
        preset = _SIZE_PRESETS[size]
        model = get_titanet(model_size=size, n_mega_blocks=n_mega)
        formula = titanet_param_count(
            n_mega_blocks=n_mega,
            hidden=preset["encoder_hidden_size"],
            kernel=preset["mega_block_kernel_size"],
        )
        assert formula == count_params(model), (size, n_mega)
    # simple_pool variant
    model = TitaNet(n_mega_blocks=2, simple_pool=True)
    formula = titanet_param_count(n_mega_blocks=2, simple_pool=True)
    assert formula == count_params(model)


def test_titanet_simple_pool_matches_reference(ref_models):
    torch.manual_seed(3)
    tmodel = ref_models.TitaNet(
        n_mels=80, n_mega_blocks=1, n_sub_blocks=3, encoder_hidden_size=32,
        encoder_output_size=48, embedding_size=16, mega_block_kernel_size=3,
        simple_pool=True, dropout=0.0,
    )
    tmodel.eval()
    jmodel = TitaNet(
        n_mega_blocks=1, n_sub_blocks=3, encoder_hidden_size=32,
        encoder_output_size=48, embedding_size=16, mega_block_kernel_size=3,
        simple_pool=True, dropout=0.0,
    )
    params, stats = convert_titanet_state_dict(tmodel.state_dict())
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    x = np.random.default_rng(5).standard_normal((2, 80, 40)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        l2_normalize(jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                  train=False))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_padded_batch_matches_reference_padding_semantics(ref_models):
    """SURVEY.md §7 hard part 2: the reference pools/normalizes over
    zero-padded frames (src/datasets.py:64-71 collation; lengths unused by
    the model). Our default (mask=None) must reproduce that exactly."""
    tmodel, jmodel, variables = _make_pair(ref_models, n_mega_blocks=1)
    rng = np.random.default_rng(7)
    # batch padded to max length with zeros, reference-style
    x = np.zeros((3, 80, 50), np.float32)
    lengths = [50, 30, 17]
    for i, ln in enumerate(lengths):
        x[i, :, :ln] = rng.standard_normal((80, ln))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        l2_normalize(jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                  train=False))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_load_reference_checkpoint_file(ref_models, tmp_path):
    """The .pth loading path handles both raw state_dicts and the
    reference's full checkpoint blobs ({model, optimizer, ...},
    src/learn.py:188-195)."""
    from titanet_tpu.utils.torch_compat import load_reference_checkpoint

    tmodel, jmodel, _ = _make_pair(ref_models, n_mega_blocks=1)
    blob = {
        "model": tmodel.state_dict(),
        "optimizer": {},
        "lr_scheduler": {},
        "epoch": 75,
    }
    path = str(tmp_path / "epoch_75.pth")
    torch.save(blob, path)
    params, stats = load_reference_checkpoint(path)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    x = np.random.default_rng(9).standard_normal((2, 80, 33)).astype(np.float32)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        l2_normalize(jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                  train=False))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # raw state_dict variant too
    torch.save(tmodel.state_dict(), path)
    params2, _ = load_reference_checkpoint(path)
    jax.tree.map(np.testing.assert_array_equal, params, params2)

    # scan_blocks=True restacks for the scanned layout (N inferred)
    sparams, sstats = load_reference_checkpoint(path, scan_blocks=True)
    smodel = jmodel.clone(scan_blocks=True)
    souts = smodel.apply(
        {"params": jax.tree.map(jnp.asarray, sparams),
         "batch_stats": jax.tree.map(jnp.asarray, sstats)},
        jnp.asarray(x.transpose(0, 2, 1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(l2_normalize(souts)), ref, rtol=1e-4, atol=1e-5
    )


def test_head_migration_from_reference_checkpoint(ref_models, tmp_path):
    """Reference checkpoints include the loss head under loss_function.*;
    migrated heads must produce identical logits/loss."""
    import losses as ref_losses

    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.utils.torch_compat import load_reference_checkpoint

    torch.manual_seed(1)
    loss = ref_losses.ArcFaceLoss(16, 5, scale=30, margin=0.2)
    tmodel = ref_models.TitaNet(
        n_mels=80, n_mega_blocks=1, n_sub_blocks=3, encoder_hidden_size=32,
        encoder_output_size=48, embedding_size=16, mega_block_kernel_size=3,
        loss_function=loss, dropout=0.0,
    )
    path = str(tmp_path / "ck.pth")
    torch.save({"model": tmodel.state_dict()}, path)
    params, stats, head_params = load_reference_checkpoint(path, with_head=True)
    assert head_params is not None and head_params["weight"].shape == (16, 5)

    emb = np.random.default_rng(0).standard_normal((6, 16)).astype(np.float32) * 2
    targets = np.asarray([0, 1, 2, 3, 4, 0])
    tmodel.eval()
    with torch.no_grad():
        _, r_preds, r_loss = loss(torch.from_numpy(emb), torch.from_numpy(targets))
        # reference renormalizes its weight in place during forward; use the
        # post-forward weight for exact comparison
        w_after = loss.fc.weight.detach().numpy()
    head = build_head("arc", 16, 5, scale=30.0, margin=0.2, stable=False)
    o = head.apply({"params": {"weight": jnp.asarray(w_after.T)}},
                   jnp.asarray(emb), jnp.asarray(targets))
    np.testing.assert_allclose(float(o[2]), float(r_loss), rtol=1e-4)


def test_reverse_export_round_trip(ref_models, tmp_path):
    """titanet_tpu -> reference-format .pth (learn.py:188-199 layout) ->
    reference torch model: strict load + embedding cosine round trip.
    Makes the migration story bidirectional (VERDICT r3 item 7)."""
    from titanet_tpu.utils.torch_compat import save_reference_checkpoint

    tmodel, jmodel, _ = _make_pair(ref_models)
    # OUR freshly initialised weights (not the torch ones) are the source
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 80, 57)).astype(np.float32)
    variables = jmodel.init(jax.random.key(7), jnp.asarray(x.transpose(0, 2, 1)))
    path = str(tmp_path / "export.pth")
    save_reference_checkpoint(
        path, variables["params"], variables["batch_stats"], epoch=3
    )

    blob = torch.load(path, map_location="cpu", weights_only=True)
    assert set(blob) == {"model", "optimizer", "lr_scheduler", "epoch"}
    assert blob["epoch"] == 3
    missing, unexpected = tmodel.load_state_dict(blob["model"], strict=True)
    assert not missing and not unexpected
    tmodel.eval()

    with torch.no_grad():
        ref_emb = tmodel(torch.from_numpy(x)).numpy()
    out = jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 1)), train=False)
    ours = np.asarray(l2_normalize(out))
    cos = (ours * ref_emb).sum(-1)
    assert np.all(1.0 - cos < 1e-5), f"round-trip cosine drift: {1 - cos}"


def test_reverse_export_scan_layout_and_heads(ref_models, tmp_path):
    """Reverse export accepts the scan_blocks (stacked) layout and attaches
    reference loss_function.* keys for CE and angular heads."""
    from titanet_tpu.losses.heads import build_head
    from titanet_tpu.models import stack_mega_block_params
    from titanet_tpu.utils.torch_compat import (
        export_head_state_dict,
        export_titanet_state_dict,
    )

    tmodel, jmodel, variables = _make_pair(ref_models)
    stacked = {k: stack_mega_block_params(variables[k], 2) for k in variables}
    sd_flat = export_titanet_state_dict(
        variables["params"], variables["batch_stats"]
    )
    sd_stacked = export_titanet_state_dict(
        stacked["params"], stacked["batch_stats"]
    )
    assert set(sd_flat) == set(sd_stacked)
    for k in sd_flat:
        np.testing.assert_array_equal(sd_flat[k], sd_stacked[k], err_msg=k)

    head = build_head("ce", 32, 8)
    hp = head.init(jax.random.key(0), jnp.zeros((2, 32)),
                   jnp.zeros((2,), jnp.int32))["params"]
    hd = export_head_state_dict("ce", hp)
    assert set(hd) == {"loss_function.fc.weight", "loss_function.fc.bias"}
    assert hd["loss_function.fc.weight"].shape == (8, 32)

    arc = build_head("arc", 32, 8)
    ap = arc.init(jax.random.key(0), jnp.zeros((2, 32)),
                  jnp.zeros((2,), jnp.int32))["params"]
    ad = export_head_state_dict("arc", ap)
    assert set(ad) == {"loss_function.fc.weight"}
    assert ad["loss_function.fc.weight"].shape == (8, 32)
