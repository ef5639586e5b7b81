"""Device-resident corpus: the training waveforms live in HBM.

TPU-native answer to SURVEY.md §2.2's "host async pipeline" row for
corpora that fit device memory (the reference re-decodes and re-uploads
every example every epoch from its DataLoader workers,
``/root/reference/src/datasets.py:283-294``): the whole corpus is
quantized to int16 PCM (the sources' own bit depth), concatenated into
ONE flat device array, and uploaded ONCE per process. Each step then
ships only a tiny batch descriptor (utterance offsets + crop starts +
lengths, ~1 KB) and the window gather/crop/zero-mask runs on device.

Why: host->device waveform transfer is the dominant cost of a training
step whenever the link is thin relative to the model — measured here
(remote-TPU relay, ~20 MB/s effective): a B=64 x 3 s f32 batch is
~12 MB = ~0.7 s/step against ~13 ms of device compute. On pod hosts the
same design removes the per-step PCIe dependency and frees the host for
decode of corpora that do NOT fit HBM.

Semantics parity: batch composition, chunk draws, bucket choice and
zero-padding replicate the host loader bit-for-bit (same
``(seed, epoch, position)`` RNG streams — ``DataLoader._plan_one`` is
the shared source of truth); the only numeric difference vs the
float32 host path is int16 waveform quantization (|err| <= 2^-16,
the same PCM precision the ``cache_waveforms`` host cache and the
``transport_dtype="int16"`` wire format already use).

Eligibility: host-side augmentations that transform the waveform
(speed/reverb/noise-mix) disable device mode — chunking and the
device-side SpecAugment/noise paths keep it eligible.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import numpy as np

# corpus cache across runs in one process (benchmark campaigns rebuild
# identical datasets per run; re-uploading ~GBs each time would dominate)
_CORPUS_CACHE: dict = {}


def resolve_base(dataset):
    """Walk Subset views to the root dataset; returns (root, base_of_local)
    where ``base_of_local[i]`` maps view-local index i -> root index."""
    indices = None
    ds = dataset
    while hasattr(ds, "parent") and hasattr(ds, "indices"):
        own = np.asarray(ds.indices, np.int64)
        indices = own if indices is None else own[indices]
        ds = ds.parent
    if indices is None:
        indices = np.arange(len(ds), dtype=np.int64)
    return ds, indices


class DeviceCorpus:
    """Flat int16 PCM corpus on device + host-side offset/length tables.

    With ``root_indices`` (multi-host corpus sharding) only that subset of
    the root dataset is decoded and uploaded; the host tables stay
    root-indexed (``offsets[i] = -1`` marks an utterance this shard does
    not own), so :meth:`titanet_tpu.data.loader.DataLoader._plan_one`
    addresses owned utterances identically in both modes.
    """

    def __init__(self, flat_device, offsets, lengths, speaker_ids,
                 sample_rate, n_owned=None):
        self.flat = flat_device  # jnp int16 [S + tail]
        self.offsets = offsets  # np int64 [N]; -1 = not on this shard
        self.lengths = lengths  # np int32 [N] samples per utterance
        self.speaker_ids = speaker_ids  # np int32 [N]
        self.sample_rate = sample_rate
        self.n_owned = len(offsets) if n_owned is None else int(n_owned)

    def owns(self, root_idx: int) -> bool:
        return self.offsets[root_idx] >= 0

    @classmethod
    def build(cls, dataset, sample_rate: int, tail_pad: int = 400_000,
              slab_bytes: int = 32 << 20, cache_key=None, root_indices=None):
        """Decode/synthesize every utterance of the ROOT dataset once
        (mono, resampled — the same decode path as the host loader),
        quantize to int16, upload as one flat device array.

        ``tail_pad`` zeros terminate the flat array so the LAST
        utterance's window slice can never run off the end (mid-corpus
        overruns are zero-masked in :func:`gather_windows`, so no
        per-utterance padding is needed).

        ``root_indices``: decode/upload ONLY these root-dataset indices
        (per-host corpus shard for multi-host training — each host's HBM
        holds ~1/P of the corpus).
        """
        if cache_key is not None and cache_key in _CORPUS_CACHE:
            return _CORPUS_CACHE[cache_key]
        import jax
        import jax.numpy as jnp

        from titanet_tpu.data.loader import _resample_host

        n = len(dataset)
        include = (np.arange(n, dtype=np.int64) if root_indices is None
                   else np.asarray(sorted(set(int(i) for i in root_indices)),
                                   np.int64))
        waves, lengths, speakers = [], np.zeros(n, np.int32), np.zeros(n, np.int32)
        for i in include:
            wav, sr, speaker = dataset.get_sample(int(i))
            wav = np.asarray(wav, np.float32)
            if wav.ndim == 2:
                wav = wav.mean(axis=0) if wav.shape[0] > 1 else wav[0]
            if sr != sample_rate:
                wav = _resample_host(wav, sr, sample_rate)
            q = np.clip(wav * 32768.0, -32768.0, 32767.0).astype(np.int16)
            waves.append(q)
            lengths[i] = len(q)
            speakers[i] = dataset.speakers_to_id[speaker]
        offsets = np.full(n, -1, np.int64)
        pos = 0
        for i, w in zip(include, waves):
            offsets[i] = pos
            pos += len(w)
        total = pos
        flat = np.zeros(total + tail_pad, np.int16)
        for i, w in zip(include, waves):
            flat[int(offsets[i]):int(offsets[i]) + len(w)] = w
        del waves
        if len(flat) >= 2**31:
            # int32 window starts (XLA-friendly) cap the corpus at 2^31
            # samples ~ 37 hours @ 16 kHz; larger corpora stay host-fed
            raise ValueError(
                f"corpus too large for device residency ({flat.nbytes/2**30:.1f}"
                " GiB int16); use the host loader"
            )
        slab = max(slab_bytes // flat.itemsize, 1)
        parts = [jax.device_put(flat[a:a + slab]) for a in range(0, len(flat), slab)]
        flat_dev = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        flat_dev.block_until_ready()
        corpus = cls(flat_dev, offsets, lengths, speakers, sample_rate,
                     n_owned=len(include))
        if cache_key is not None:
            _CORPUS_CACHE[cache_key] = corpus
        return corpus


@functools.lru_cache(maxsize=64)
def _gather_fn(t: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gather(flat, starts, lengths):
        pos = jnp.arange(t, dtype=jnp.int32)

        def one(s, l):
            w = jax.lax.dynamic_slice(flat, (s,), (t,))
            return jnp.where(pos < l, w, jnp.int16(0))

        return jax.vmap(one)(starts, lengths)

    return gather


def gather_windows(corpus: DeviceCorpus, starts, lengths, t: int):
    """``[B]`` absolute sample starts + valid lengths -> ``[B, t]`` int16
    windows on device (content beyond each length zero-masked, matching
    the host collate's zero padding — src/datasets.py:64-71 semantics)."""
    import jax.numpy as jnp

    return _gather_fn(int(t))(
        corpus.flat,
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(lengths, jnp.int32),
    )


@dataclass
class DeviceBatch:
    """Batch descriptor: host metadata only; waveforms materialize on
    device via :meth:`gather`. Duck-types the fields of
    :class:`titanet_tpu.data.loader.Batch` that the loops read."""

    corpus: DeviceCorpus
    starts: np.ndarray  # int64 [B] absolute sample starts in corpus.flat
    lengths: np.ndarray  # int32 [B] valid samples per row
    speaker_ids: np.ndarray  # int32 [B]
    t: int  # bucket length (static window width)

    def __len__(self):
        return len(self.speaker_ids)

    def gather(self):
        import jax.numpy as jnp

        wav = gather_windows(self.corpus, self.starts, self.lengths, self.t)
        return (
            wav,
            jnp.asarray(self.lengths),
            jnp.asarray(self.speaker_ids),
        )

    def gather_global(self, sharding):
        """Multi-host assembly: gather THIS host's ``[B_local, t]`` windows
        on device, then stitch the per-process pieces into one global
        ``[P * B_local, t]`` array under ``sharding`` — waveform bytes
        never round-trip through the host (the point of device residency;
        the descriptor-sized lengths/speaker_ids take the host path).

        Convention (same as parallel.global_batch_array /
        jax.make_array_from_process_local_data): the global batch is the
        process-ordered concatenation of local batches, and the mesh's
        device order is process-major, so process ``p`` owns global rows
        ``[p * B_local, (p+1) * B_local)``.
        """
        import jax
        import jax.numpy as jnp

        from titanet_tpu.parallel import global_batch_array

        wav_local = gather_windows(self.corpus, self.starts, self.lengths,
                                   self.t)
        if jax.process_count() == 1:
            wav = jax.device_put(wav_local, sharding)
        else:
            b_local = wav_local.shape[0]
            global_shape = (b_local * jax.process_count(),) + wav_local.shape[1:]
            row0 = jax.process_index() * b_local
            pieces = []
            for dev, idx in sharding.addressable_devices_indices_map(
                global_shape
            ).items():
                rows = idx[0]
                lo = 0 if rows.start is None else rows.start
                hi = global_shape[0] if rows.stop is None else rows.stop
                assert row0 <= lo and hi <= row0 + b_local, (
                    "batch sharding does not map this process's rows to its "
                    "own devices; use a process-major data mesh"
                )
                pieces.append(
                    jax.device_put(wav_local[lo - row0:hi - row0], dev)
                )
            wav = jax.make_array_from_single_device_arrays(
                global_shape, sharding, pieces
            )
        return (
            wav,
            global_batch_array(sharding, np.asarray(self.lengths)),
            global_batch_array(sharding, np.asarray(self.speaker_ids)),
        )


def corpus_cache_key(root_dataset) -> Optional[tuple]:
    """A content-identity key for cross-run corpus reuse (same process).
    Synthetic datasets are keyed by their generation parameters; disk
    corpora by identity (no reuse across dataset objects)."""
    key = getattr(root_dataset, "_synth_cache_key", None)
    if key is not None:
        return ("synthetic",) + tuple(key)
    return ("id", id(root_dataset))
