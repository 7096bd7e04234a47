"""Host-side batching: pad-to-bucket with length masks (SURVEY.md §7.1 #3).

Utterances of arbitrary length are grouped into a small set of bucket
lengths so XLA compiles one program per (bucket, batch-size) instead of one
per utterance length. Lengths travel with the batch; every on-device stage
is mask-aware, so the features of an utterance inside a padded batch equal
the features of that utterance alone, bit-for-bit on valid frames
(masking-invariance gate, SURVEY.md §4.2 item 4).

Pad-occupancy (valid-sample fraction) is reported so feeding efficiency is
observable (SURVEY.md §5 metrics row).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Sequence

import numpy as np

from mfcc_tpu.config import FrontendConfig


def required_samples(bucket_len: int, cfg: FrontendConfig) -> int:
    """Samples the time axis must hold so the last frame's gather of a
    bucket_len-sample utterance stays in bounds: (F-1)*S + L >= bucket_len."""
    f = cfg.num_frames(bucket_len)
    return max(bucket_len, cfg.padded_length(f))


def make_buckets(
    max_len_s: float, cfg: FrontendConfig, n_buckets: int = 4
) -> tuple[int, ...]:
    """Geometric bucket boundaries in samples, aligned to whole frame hops so
    bucket edges land on frame boundaries (keeps F per bucket minimal)."""
    sr = cfg.sample_rate
    max_len = int(round(max_len_s * sr))
    S = cfg.frame_step
    lo = min(0.5 * sr, max_len)  # never emit buckets beyond max_len
    ratio = (max_len / lo) ** (1.0 / max(1, n_buckets - 1)) if max_len > lo else 1.0
    raw = [lo * ratio**i for i in range(n_buckets)]
    top = int(np.ceil(max_len / S)) * S
    buckets = sorted(
        {min(int(np.ceil(b / S)) * S, top) for b in raw} | {top}
    )
    return tuple(buckets)


def bucket_for(n_samples: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n_samples (clamps to the largest: caller truncates
    or splits over-long audio upstream)."""
    for b in buckets:
        if n_samples <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class Batch:
    """One padded batch ready for device transfer."""

    audio: np.ndarray  # [B, T] compute dtype (or int16 for the i16 feed);
    # [B, n_sup, step] when built with a resample BlockedLayout
    lengths: np.ndarray  # [B] int32 valid sample counts
    ids: list  # opaque per-utterance keys (paths, indices)
    on_release: object = None  # producer callback: audio buffer reusable
    # the extract_batch input_layout kind of this batch's audio layout
    # ("auto" | "blocked" | "resample_slab") — layout-aware consumers pass
    # it through so the 44.1 kHz blocked-vs-rs shape ambiguity never bites
    layout_kind: str = "auto"

    @property
    def pad_occupancy(self) -> float:
        """Fraction of the audio buffer holding real samples (1.0 = no waste)."""
        cells = self.audio.shape[0] * int(np.prod(self.audio.shape[1:]))
        return float(self.lengths.sum()) / float(cells)

    def release(self) -> None:
        """Hand the audio buffer back to the producer for reuse. Call once
        the batch's data has been fully consumed (e.g. device compute
        fetched): freshly-allocated batch buffers cost a page-fault pass
        per batch (~40 MB at batch-64 × 10 s fp32), which recycling
        eliminates. Never required — an unreleased batch is simply
        garbage-collected and the producer allocates a new slab."""
        cb, self.on_release = self.on_release, None
        if cb is not None:
            cb(self)


def resample_layout(
    cfg: FrontendConfig, bucket_len: int
) -> "object | None":
    """BlockedLayout for a resampling config's bucket (None when the config
    doesn't resample or the blocked fast path doesn't apply) — pass the
    result to pad_batch(layout=...) to get the zero-relayout device path."""
    if not cfg.input_sample_rate or cfg.input_sample_rate == cfg.sample_rate:
        return None
    from mfcc_tpu.ops import resample

    return resample.blocked_layout(
        cfg.input_sample_rate, cfg.sample_rate, bucket_len
    )


def device_layout(cfg: FrontendConfig, bucket_len: int) -> "object | None":
    """The device-optimal host feed layout for this config's bucket, for
    pad_batch(layout=...): a resample BlockedLayout (resampling configs — the
    device resample becomes two pure-slice MXU dots), a frontend SlabLayout
    (fused-kernel configs — the device-side slab retile and, for centered
    framing, the XLA reflect-extension prologue disappear), or None (feed
    flat [B, T]; jnp-only configs and non-fp32 dtypes).

    Layout batches require backend='pallas' in extract_batch except for
    BlockedLayout, which both backends accept."""
    from mfcc_tpu.kernels import frontend

    if cfg.input_sample_rate and cfg.input_sample_rate != cfg.sample_rate:
        # r5: prefer the in-kernel fused resample slab (ONE kernel from
        # blocked sr_in PCM to log-mel, int16 rows supported); fall back
        # to the BlockedLayout + XLA-dots seam when the design can't block
        # at J = hop or the input slab exceeds the VMEM budget
        rlay = frontend.resample_slab_layout(cfg, bucket_len)
        if rlay is not None:
            return rlay
        return resample_layout(cfg, bucket_len)
    return frontend.slab_layout(cfg, bucket_len)


def layout_kind(layout) -> str:
    """The extract_batch input_layout kind for a device_layout result:
    "auto" (flat / chunk-slab feeds — unambiguous by shape), "blocked"
    (resample BlockedLayout) or "resample_slab" (the r5 in-kernel fused
    resample). Callers that built the layout should pass this through so
    the 44.1 kHz blocked-vs-rs shape ambiguity never bites (see
    chain.extract_batch input_layout)."""
    if layout is None:
        return "auto"
    if hasattr(layout, "pad_lo") and hasattr(layout, "pro"):
        return "resample_slab"  # frontend.ResampleSlabLayout
    if hasattr(layout, "n_sup"):
        return "blocked"  # ops.resample.BlockedLayout
    return "auto"  # SlabLayout (chunk slab): dispatches by lane width == hop


def feed_geometry(cfg: FrontendConfig, blen: int, layout) -> tuple:
    """(row_offset, flat_T, out_shape | None) for a feed that decodes raw
    samples directly into batch rows (io.reader stream_batches_direct/_mp).
    Handles layout=None (flat), BlockedLayout, and non-extended SlabLayout;
    extended (center-mode) slabs need per-row host transforms those feeds
    can't do in the decode-into-buffer model — callers pass layout=None for
    them (pad_batch-based feeds handle every kind)."""
    if layout is None:
        return 0, required_samples(blen, cfg), None
    if hasattr(layout, "chunk"):  # SlabLayout / ResampleSlabLayout
        if layout.extended:
            raise ValueError(
                "extended slab layouts need pad_batch's host transform"
            )
        return (
            layout.flat_offset,
            layout.n_rows * layout.chunk,
            layout.buffer_shape,
        )
    return layout.pad_lo, layout.n_sup * layout.step, layout.buffer_shape


def pad_batch(
    utterances: Iterable[np.ndarray],
    cfg: FrontendConfig,
    bucket_len: int | None = None,
    ids: Sequence | None = None,
    pad_batch_to: int | None = None,
    copy_pool=None,
    layout=None,
) -> Batch:
    """Stack variable-length utterances into a zero-padded [B, T] buffer.

    T = required_samples(bucket_len or max utterance length). Over-long
    utterances (> bucket_len) are truncated with a loud error instead of
    silently: callers pick buckets with make_buckets/bucket_for.
    pad_batch_to: optionally right-pad the batch axis with zero-length rows
    (lengths 0) so every batch in a stream shares one compiled shape.
    copy_pool: optional concurrent.futures.Executor; row fills are
    contiguous same-dtype copies/memsets for which NumPy releases the GIL,
    so a thread pool genuinely parallelizes batch assembly (the serial
    consumer copy was the feed pipeline's bottleneck after decode threads).
    layout: optional device feed layout (see device_layout): a resample
    BlockedLayout emits [rows, n_sup, step] polyphase-blocked rows (the
    device resample skips its ~2.3 ms/batch input relayout); a frontend
    SlabLayout emits [rows, n_rows, chunk] kernel chunk slabs (the device
    slab retile — and for centered configs the XLA reflect-extension
    prologue — disappears). Same single copy, same H2D bytes either way;
    extract_batch dispatches on the 3-D shape.
    """
    utts = [np.asarray(u) for u in utterances]
    if not utts:
        raise ValueError("empty batch")
    lengths = np.array([u.shape[0] for u in utts], dtype=np.int32)
    blen = bucket_len if bucket_len is not None else int(lengths.max())
    too_long = lengths > blen
    if too_long.any():
        raise ValueError(
            f"{int(too_long.sum())} utterance(s) exceed bucket {blen}; "
            "split or re-bucket upstream"
        )
    slab = layout is not None and hasattr(layout, "chunk")
    xform = None
    if slab:
        if blen > layout.bucket_len:
            raise ValueError(
                f"bucket {blen} exceeds slab layout bucket {layout.bucket_len}"
            )
        off = layout.flat_offset
        T = layout.n_rows * layout.chunk
        if layout.extended:
            xform = lambda u: layout.host_rows(cfg, u)  # noqa: E731
    elif layout is not None:
        if blen > layout.n_sup * layout.step - layout.pad_lo:
            raise ValueError(
                f"bucket {blen} exceeds blocked layout capacity "
                f"{layout.n_sup * layout.step - layout.pad_lo}; build the "
                "layout from the bucket length (pipeline.device_layout)"
            )
        off = layout.pad_lo
        T = layout.n_sup * layout.step
    else:
        off = 0
        T = required_samples(blen, cfg)
    B = len(utts)
    rows = B if pad_batch_to is None else max(B, pad_batch_to)
    dtype = np.dtype(cfg.dtype)
    # np.empty + explicit tail zeroing: zeroing the whole buffer costs a
    # full memory pass the valid samples immediately overwrite
    audio = np.empty((rows, T), dtype=dtype)

    def fill_row(i: int, u: np.ndarray) -> None:
        if xform is not None:
            u = xform(u)
        n = u.shape[0]
        audio[i, :off] = 0.0
        audio[i, off : off + n] = u
        audio[i, off + n :] = 0.0

    if copy_pool is None:
        for i, u in enumerate(utts):
            fill_row(i, u)
    else:
        list(copy_pool.map(fill_row, range(B), utts))
    audio[B:] = 0.0
    out_lengths = np.zeros(rows, dtype=np.int32)
    out_lengths[:B] = lengths
    if ids is not None and len(ids) != B:
        raise ValueError(
            f"{len(ids)} ids for {B} utterances — misaligned ids would key "
            "shard rows to the wrong files"
        )
    out_ids = list(ids) if ids is not None else list(range(B))
    out_ids += [None] * (rows - B)
    if layout is not None:
        audio = audio.reshape(rows, *layout.buffer_shape)
    return Batch(audio=audio, lengths=out_lengths, ids=out_ids,
                 layout_kind=layout_kind(layout))
