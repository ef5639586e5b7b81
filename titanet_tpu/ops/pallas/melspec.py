"""Fused Pallas mel-spectrogram kernels (reference src/transforms.py:111-203).

Two fusion levels of the chain that
:func:`titanet_tpu.ops.frontend.log_mel_spectrogram` expresses as separate
XLA ops (window -> real DFT as GEMM, cf. nnAudio/MelT in PAPERS.md ->
|.|^2 -> mel matmul -> 10*log10 -> L2-normalize over mels):

- :func:`log_mel_spectrogram_pallas` — XLA framing + one kernel for
  DFT..norm; the complex spectrum never leaves VMEM, but the [B, F, n_fft]
  frames tensor still round-trips HBM.
- :func:`log_mel_spectrogram_pallas_fused` — the ENTIRE frontend in one
  kernel: waveform rows DMA straight from HBM, framing happens implicitly
  as phase-decomposed lane-aligned matmuls (:func:`_phase_basis`), frames
  AND spectrum never exist in HBM. At serving precision this is the
  measured-fastest wav->mel path on the chip — 1.4x the best XLA pipeline
  (0.26 vs 0.37 ms for B=128 x 3 s; bench_frontend.py, BENCHMARKS.md);
  at HIGHEST (torchaudio-parity) precision XLA's strided path wins and
  remains the default.

Numerics match the jnp reference path to ~1e-5 relative (f32 accumulate,
'highest'); both are drop-ins for the jnp version.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from titanet_tpu.ops.frontend import (
    FrontendConfig,
    _dft_matrices,
    _framing_buffer,
    frame_signal,
    mel_filterbank,
    padded_window,
)

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _fused_weights(cfg: FrontendConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(windowed DFT basis [n_fft, 2*bins_pad], mel fb [bins_pad, 128],
    n_bins). The window is folded into the DFT basis (one less VPU pass)."""
    n_bins = cfg.n_fft // 2 + 1
    bins_pad = _round_up(n_bins, _LANES)
    cos_m, sin_m = _dft_matrices(cfg.n_fft)
    window = padded_window(cfg.n_fft, cfg.win_length).astype(np.float64)[:, None]
    basis = np.zeros((cfg.n_fft, 2 * bins_pad), np.float32)
    basis[:, :n_bins] = cos_m * window
    basis[:, bins_pad : bins_pad + n_bins] = sin_m * window
    fb = mel_filterbank(n_bins, cfg.n_mels, cfg.sample_rate)
    fb_pad = np.zeros((bins_pad, _round_up(cfg.n_mels, _LANES)), np.float32)
    fb_pad[:n_bins, : cfg.n_mels] = fb
    return basis, fb_pad, n_bins


def _mel_kernel(frames_ref, basis_ref, fb_ref, out_ref, *, bins_pad, n_mels, prec):
    frames = frames_ref[:]  # [TN, n_fft]
    # HIGHEST precision by default: the MXU's bf16 passes lose ~5e-2 through
    # the power->dB->L2 chain (power spans 1e-10..1); the DFT is
    # parity-critical. cfg.precision='default' trades that for speed.
    spec = jnp.dot(
        frames, basis_ref[:],
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    re = spec[:, :bins_pad]
    im = spec[:, bins_pad:]
    power = re * re + im * im  # [TN, bins_pad]; padded bins are exactly 0
    mel = jnp.dot(
        power, fb_ref[:],
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    # L2 norm over the real mel bins only (padded lanes hold 10*log10(1e-10))
    col = jax.lax.broadcasted_iota(jnp.int32, db.shape, 1)
    masked = jnp.where(col < n_mels, db, 0.0)
    norm = jnp.sqrt(jnp.sum(masked * masked, axis=1, keepdims=True))
    out_ref[:] = masked / jnp.maximum(norm, 1e-12)


def _mel_frames_pallas(frames: jax.Array, cfg: FrontendConfig, block: int = 256):
    """frames [N, n_fft] -> normalized log-mel [N, n_mels]."""
    basis, fb_pad, n_bins = _fused_weights(cfg)
    bins_pad = fb_pad.shape[0]
    mels_pad = fb_pad.shape[1]
    n = frames.shape[0]
    n_pad = _round_up(max(n, block), block)
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // block,)
    prec = (
        jax.lax.Precision.HIGHEST
        if cfg.precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        functools.partial(
            _mel_kernel, bins_pad=bins_pad, n_mels=cfg.n_mels, prec=prec
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, cfg.n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, 2 * bins_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_pad, mels_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, mels_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, mels_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * cfg.n_fft * 2 * bins_pad + 2 * n_pad * bins_pad * mels_pad,
            bytes_accessed=n_pad * (cfg.n_fft + mels_pad) * 4,
            transcendentals=n_pad * mels_pad,
        ),
    )(frames.astype(jnp.float32), jnp.asarray(basis), jnp.asarray(fb_pad))
    return out[:n, : cfg.n_mels]


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


def fused_kernel_supports(cfg: FrontendConfig) -> bool:
    """True when the phase decomposition covers this geometry: each frame
    may spill into at most ONE following row, i.e. n_fft <= lcm(hop, 128).
    Callers (ops.frontend.log_mel_spectrogram) fall back to the XLA paths
    otherwise."""
    return cfg.n_fft <= _lcm(cfg.hop_length, _LANES)


@functools.lru_cache(maxsize=8)
def _phase_basis(cfg: FrontendConfig):
    """Windowed DFT basis arranged for phase-decomposed framing.

    The padded signal is viewed as rows of ``L = lcm(hop, 128)`` samples —
    the smallest lane-aligned row width (HBM DMA slices must be 128-aligned
    on the lane dim), holding ``P = L/hop`` frame starts per row. Frame
    ``t = P*q + p`` starts ``hop*p`` lanes into row ``q`` and (for
    ``n_fft <= L``) spills at most into row ``q+1``, so its DFT is

        spec[t] = W[q, sA:L] @ A_p  (+ W[q+1, 0:eC] @ C_p  if it spills)

    with ``sA = 128*floor(hop*p/128)`` — every slice lane-aligned. All A_p
    and C_p are sublane slices of ONE resident extended basis ``Epad``
    (leading/trailing zero rows absorb the off-by-(hop*p mod 128) offsets),
    so the kernel holds a single constant in VMEM. Re|im are PACKED into
    ``round_up(2*n_bins, 128)`` columns (640 for 512-FFT, not 2x384), and
    |.|^2 -> mel folds into ``spec^2 @ FB2`` with a bins-duplicated
    filterbank — no re/im lane slicing, 17% fewer DFT columns. Total MXU
    work is sum_p(KA_p + KC_p) vs the ideal P*n_fft — ~1.19x for the
    default 512/160 geometry.

    Returns (Epad [*, n_cols], FB2 [n_cols, mels_pad], L, P, slices) where
    slices[p] = (s_a, a_off, a_len, c_off, c_len): W lane start + sublane
    offsets/lengths into Epad; c_len == 0 means no spill matmul.
    """
    hop, n_fft = cfg.hop_length, cfg.n_fft
    n_bins = n_fft // 2 + 1
    n_cols = _round_up(2 * n_bins, _LANES)
    l_row = _lcm(hop, _LANES)
    p_phases = l_row // hop
    assert n_fft <= l_row, (
        f"fused frontend kernel requires n_fft ({n_fft}) <= lcm(hop, 128) "
        f"({l_row}); use the XLA paths for this geometry"
    )
    cos_m, sin_m = _dft_matrices(n_fft)
    window = padded_window(n_fft, cfg.win_length).astype(np.float64)[:, None]
    basis = np.zeros((n_fft, n_cols), np.float32)
    basis[:, :n_bins] = cos_m * window
    basis[:, n_bins : 2 * n_bins] = sin_m * window
    # Epad = [lead zeros | basis | tail zeros]; lead absorbs the largest
    # (sA - off) shift, tail lets every slice stay in bounds. The 16-row
    # rounding makes the default geometries' slice offsets tile-aligned
    # (hop=160 -> offsets {0,32,64,96}); other hops can yield offsets that
    # are NOT sublane-tile multiples — Mosaic still compiles those (the
    # kernel's own W[1:M+1] spill slice is offset-1 and runs on hardware),
    # just via slower relayout reads.
    lead = max(hop * p - 128 * ((hop * p) // 128) for p in range(p_phases))
    lead = _round_up(lead, 16)
    slices = []
    max_end = 0
    for p in range(p_phases):
        off = hop * p
        s_a = 128 * (off // 128)
        # trim trailing all-zero basis rows (p=0's frame ends before l_row)
        a_len = min(l_row - s_a, _round_up(off + n_fft - s_a, 128))
        a_off = lead + s_a - off  # Epad row for A_p's first lane
        spill = off + n_fft - l_row
        if spill > 0:
            c_len = 128 * (-(-spill // 128))
            c_off = lead + (l_row - off)
        else:
            c_len, c_off = 0, 0
        slices.append((s_a, a_off, a_len, c_off, c_len))
        max_end = max(max_end, a_off + a_len, c_off + c_len)
    epad = np.zeros((_round_up(max_end, 16), n_cols), np.float32)
    epad[lead : lead + n_fft] = basis
    fb = mel_filterbank(n_bins, cfg.n_mels, cfg.sample_rate)
    fb2 = np.zeros((n_cols, _round_up(cfg.n_mels, _LANES)), np.float32)
    fb2[:n_bins, : cfg.n_mels] = fb
    fb2[n_bins : 2 * n_bins, : cfg.n_mels] = fb  # im^2 lands on the same mels
    return epad, fb2, l_row, p_phases, tuple(slices)


def _fused_kernel(
    buf_ref, epad_ref, fb_ref, out_ref, w_ref, sem,
    *, m_rows, slices, n_mels, prec, n_steps,
):
    # One grid step = G whole utterances' rows (M = G * rows_per_b): few,
    # fat steps so the [M, K] matmuls fill the MXU and per-step overhead
    # amortizes. Double-buffered DMA: start step s+1's rows while computing
    # step s (per-step DMA latency, not bandwidth, would otherwise
    # serialize with the matmuls).
    s = pl.program_id(0)
    slot = jax.lax.rem(s, 2)

    def dma(step, sl):
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(step * m_rows, w_ref.shape[1]), :],
            w_ref.at[sl], sem.at[sl],
        )

    @pl.when(s == 0)
    def _():
        dma(s, slot).start()

    @pl.when(s + 1 < n_steps)
    def _():
        dma(s + 1, 1 - slot).start()

    dma(s, slot).wait()
    w = w_ref[slot]  # [M + 16, L], f32 or bf16 (precision='default')
    dtype = w_ref.dtype
    for p, (s_a, a_off, a_len, c_off, c_len) in enumerate(slices):
        spec = jnp.dot(
            w[0:m_rows, s_a : s_a + a_len], epad_ref[a_off : a_off + a_len, :],
            preferred_element_type=jnp.float32, precision=prec,
        )
        if c_len:
            spec += jnp.dot(
                w[1 : m_rows + 1, 0:c_len], epad_ref[c_off : c_off + c_len, :],
                preferred_element_type=jnp.float32, precision=prec,
            )
        # |.|^2 then mel in one matmul: FB2 duplicates the filterbank over
        # the re and im column halves, so spec^2 @ FB2 = (re^2 + im^2) @ fb
        power = spec * spec  # padded cols are exactly 0
        mel = jnp.dot(
            power.astype(dtype), fb_ref[:],
            preferred_element_type=jnp.float32, precision=prec,
        )
        db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        col = jax.lax.broadcasted_iota(jnp.int32, db.shape, 1)
        masked = jnp.where(col < n_mels, db, 0.0)
        norm = jnp.sqrt(jnp.sum(masked * masked, axis=1, keepdims=True))
        out_ref[0, p] = masked / jnp.maximum(norm, 1e-12)


def log_mel_spectrogram_pallas_fused(
    waveform: jax.Array,
    cfg: FrontendConfig,
    lengths: Optional[jax.Array] = None,
    block: int = 2560,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Whole frontend in ONE kernel: ``[B, T] -> ([B, F, n_mels], mask)``.

    Unlike :func:`log_mel_spectrogram_pallas` (which still materializes the
    ``[B, F, n_fft]`` frames tensor in XLA — 3.2x the waveform bytes written
    AND re-read through HBM) and unlike the conv-DFT XLA path (which round-
    trips the ``[B, F, 2*n_bins]`` spectrum through HBM between the conv and
    the mel matmul), this kernel reads each waveform sample from HBM once and
    writes only the ``[B, F, n_mels]`` result: framing happens implicitly as
    phase-decomposed lane-aligned matmuls against a resident extended basis
    (see :func:`_phase_basis`), and DFT -> |.|^2 -> mel -> dB -> L2-norm all
    stay in VMEM. HBM traffic/frame: ~``hop+n_mels`` floats vs ~``2.2*n_fft``
    for the best XLA path. Rebuilds reference src/transforms.py:158-184.
    """
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    b_sz = waveform.shape[0]
    epad, fb2, l_row, p_phases, slices = _phase_basis(cfg)
    mels_pad = fb2.shape[1]
    if cfg.precision == "highest":
        # torchaudio-parity: f32 operands, multi-pass f32 matmuls
        prec, dtype = jax.lax.Precision.HIGHEST, jnp.float32
    else:
        # serving: bf16 operands run the MXU at its full bf16 rate (4x the
        # f32 rate) AND halve the waveform DMA — same ~5e-2 mel-error class
        # as the XLA paths' 'default' precision (measured: bench_frontend.py)
        prec, dtype = jax.lax.Precision.DEFAULT, jnp.bfloat16
    buf, n_frames, _ = _framing_buffer(waveform, cfg.n_fft, cfg.hop_length, lengths)
    # rows per utterance: every REAL frame-row's spill row (q+1) must stay
    # inside the utterance's own span, so padded-frame rows never read a
    # neighbor's samples (pad rows do, harmlessly — they're sliced off).
    q_need = -(-n_frames // p_phases)
    rows_per_b = _round_up(q_need + 1, 16)
    # group G utterances per grid step: M = G*rows_per_b matmul rows —
    # `block` caps frames/step (VMEM budget); fewer, fatter steps win.
    group = max(1, min(b_sz, block // (rows_per_b * p_phases)))
    b_pad = _round_up(b_sz, group)
    n_steps = b_pad // group
    m_rows = group * rows_per_b
    need = rows_per_b * l_row
    if buf.shape[1] < need:
        buf = jnp.pad(buf, ((0, 0), (0, need - buf.shape[1])))
    buf3d = buf[:, :need].reshape(b_sz, rows_per_b, l_row)  # free reshape
    # flatten utterances row-major + 8 tail rows (last step's spill reads)
    buf_flat = jnp.pad(buf3d, ((0, b_pad - b_sz), (0, 0), (0, 0))).reshape(
        b_pad * rows_per_b, l_row
    )
    buf_flat = jnp.pad(buf_flat, ((0, 16), (0, 0)))
    n_cols = epad.shape[1]
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel,
            m_rows=m_rows, slices=slices,
            n_mels=cfg.n_mels, prec=prec,
            n_steps=n_steps,
        ),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # waveform rows stay in HBM
            pl.BlockSpec(
                epad.shape, lambda s: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_cols, mels_pad), lambda s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, p_phases, m_rows, mels_pad),
            lambda s: (s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_steps, p_phases, m_rows, mels_pad), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, m_rows + 16, l_row), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_steps * m_rows * 2 * (
                sum(a + c for _, _, a, _, c in slices) * n_cols
                + p_phases * n_cols * mels_pad
            ),
            bytes_accessed=n_steps * m_rows
            * (l_row + p_phases * mels_pad) * jnp.dtype(dtype).itemsize,
            transcendentals=n_steps * m_rows * p_phases * mels_pad,
        ),
    )(
        buf_flat.astype(dtype),
        jnp.asarray(epad).astype(dtype),
        jnp.asarray(fb2).astype(dtype),
    )
    # out[s, p, g*rows_per_b + q] is utterance b = s*G+g's frame t = P*q + p
    out = (
        out.reshape(n_steps, p_phases, group, rows_per_b, mels_pad)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b_pad, rows_per_b * p_phases, mels_pad)
    )
    out = out[:b_sz, :n_frames, : cfg.n_mels]
    mask = None
    if lengths is not None:
        frame_ids = jnp.arange(n_frames)[None, :]
        valid = 1 + lengths[:, None] // cfg.hop_length
        mask = (frame_ids < valid).astype(out.dtype)
        out = out * mask[..., None]
    if squeeze:
        out = out[0]
        mask = mask[0] if mask is not None else None
    return out, mask


def log_mel_spectrogram_pallas(
    waveform: jax.Array,
    cfg: FrontendConfig,
    lengths: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Drop-in fused replacement for
    :func:`titanet_tpu.ops.frontend.log_mel_spectrogram` ([B, T] -> [B, F, M])."""
    b = waveform.shape[0]
    frames = frame_signal(waveform, cfg.n_fft, cfg.hop_length, lengths=lengths)
    n_frames = frames.shape[1]
    out = _mel_frames_pallas(frames.reshape(b * n_frames, cfg.n_fft), cfg)
    out = out.reshape(b, n_frames, cfg.n_mels)
    mask = None
    if lengths is not None:
        frame_ids = jnp.arange(n_frames)[None, :]
        valid = 1 + lengths[:, None] // cfg.hop_length
        mask = (frame_ids < valid).astype(out.dtype)
        out = out * mask[..., None]
    return out, mask
