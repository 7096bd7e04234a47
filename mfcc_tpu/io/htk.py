"""HTK parameter-file output (.htk/.mfc) — the classic interchange format
for MFCC features (the reference chain's conventions are HTK-lineage:
SURVEY.md Appendix C dct_norm="htk", and ASR toolchains of that family
consume HTK parameter files directly).

Format (HTK Book §5.10): a 12-byte big-endian header
    nSamples   int32   frames in the file
    sampPeriod int32   frame hop in 100 ns units
    sampSize   int16   bytes per frame (4 * feat_dim)
    parmKind   int16   base kind + qualifier bits
followed by nSamples * sampSize bytes of big-endian float32.

parmKind mapping from FrontendConfig: MFCC (6) / FBANK (7) base, _E when
energy is carried (note: the psf lineage REPLACES c0 with ln-energy rather
than appending a column — the kind code is nominal metadata, the layout is
exactly the extractor's feat_dim columns), _D/_A for the delta stack, _Z
when CMVN is applied.
"""

from __future__ import annotations

import struct

import numpy as np

from mfcc_tpu.config import FrontendConfig

__all__ = ["parm_kind", "write_htk", "read_htk", "KIND_NAMES"]

_BASE_MFCC = 6
_BASE_FBANK = 7
_Q_E = 0o000100
_Q_D = 0o000400
_Q_A = 0o001000
_Q_Z = 0o004000

KIND_NAMES = {_BASE_MFCC: "MFCC", _BASE_FBANK: "FBANK"}


def parm_kind(cfg: FrontendConfig) -> int:
    """HTK parmKind code for this config's output layout."""
    kind = _BASE_MFCC if cfg.features == "mfcc" else _BASE_FBANK
    if cfg.features == "mfcc" and cfg.append_energy:
        kind |= _Q_E
    if cfg.deltas >= 1:
        kind |= _Q_D
    if cfg.deltas >= 2:
        kind |= _Q_A
    if cfg.cmvn != "off":
        kind |= _Q_Z
    return kind


def kind_string(kind: int) -> str:
    """Human-readable parmKind, e.g. 'MFCC_E_D_A'."""
    s = KIND_NAMES.get(kind & 0o77, str(kind & 0o77))
    for bit, q in ((_Q_E, "E"), (_Q_D, "D"), (_Q_A, "A"), (_Q_Z, "Z")):
        if kind & bit:
            s += f"_{q}"
    return s


def write_htk(path, feat: np.ndarray, cfg: FrontendConfig) -> None:
    """Write one utterance's [F, D] features as an HTK parameter file."""
    feat = np.ascontiguousarray(np.asarray(feat, dtype=np.float32))
    if feat.ndim != 2:
        raise ValueError(f"expected [F, D] features, got shape {feat.shape}")
    sample_period = round(cfg.frame_step / cfg.sample_rate * 1e7)  # 100 ns
    header = struct.pack(
        ">iihh", feat.shape[0], sample_period, 4 * feat.shape[1], parm_kind(cfg)
    )
    with open(path, "wb") as f:
        f.write(header)
        f.write(feat.astype(">f4").tobytes())


def read_htk(path) -> tuple[np.ndarray, dict]:
    """Read an HTK parameter file -> ([F, D] float32, header metadata)."""
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < 12:
        raise ValueError(f"{path}: truncated HTK header ({len(raw)} bytes)")
    n, period, samp_size, kind = struct.unpack(">iihh", raw[:12])
    if samp_size <= 0 or samp_size % 4:
        raise ValueError(f"{path}: bad sampSize {samp_size} (not float32 rows)")
    dim = samp_size // 4
    body = raw[12:]
    if len(body) < n * samp_size:
        raise ValueError(
            f"{path}: expected {n * samp_size} data bytes, got {len(body)}"
        )
    feat = np.frombuffer(body[: n * samp_size], dtype=">f4").reshape(n, dim)
    meta = {
        "num_frames": n,
        "sample_period_100ns": period,
        "feat_dim": dim,
        "parm_kind": kind,
        "parm_kind_str": kind_string(kind),
    }
    return feat.astype(np.float32), meta
