"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages (model/codec loaded once per actor in ``__init__``). The image/audio
codecs are NOT in this container, so each stage gates its real path behind
an import-try at actor ``__init__``: ``use_real_codec=True`` demands the
codec (raises ``NotImplementedError`` when absent — clearly-marked stub),
``"auto"`` uses it when importable and silently falls back, and the default
``False`` runs a deterministic fake path (documented header format below)
that keeps the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — real and testable in the sandbox. When PIL / soundfile ARE
installed the real branches decode/resize/feature-extract actual media
bytes with the same output schema.

Fake payload format (synthesize_payloads): ``b"IMG1" + width:uint16_le +
height:uint16_le + pixel_bytes`` where pixel_bytes are derived from the
source text. Small ``batch_size`` is the knob for large payloads — a batch
of B payloads of P bytes must fit actor heap × concurrency.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def synthesize_payloads(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """documents → fake image payload column (deterministic from text)."""
    ids = batch[id_col].to_pylist()
    payloads = []
    for t in batch[text_col].to_pylist():
        raw = (t or "").encode("utf-8")
        w = 1 + len(raw) % 640
        h = 1 + (len(raw) * 7) % 480
        payloads.append(b"IMG1" + int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little") + raw)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


def _gate_codec(use_real_codec, import_fn, what: str):
    """Resolve the per-actor codec gate: True demands the codec (raises
    ``NotImplementedError`` when the import fails), ``"auto"`` returns it
    when importable else ``None``, False returns ``None`` (fake path)."""
    if not use_real_codec:
        return None
    try:
        return import_fn()
    except ImportError as e:
        if use_real_codec == "auto":
            return None
        raise NotImplementedError(
            f"real {what} path needs a codec that is not installed; "
            "use the deterministic fake path (use_real_codec=False) or 'auto'"
        ) from e


def _import_pil():
    import PIL.Image

    return PIL.Image


def _import_soundfile():
    import soundfile

    return soundfile


class ImageDecoder:
    """Actor-pool stage: payload → (width, height, mean_byte, hist8 feature).

    ``use_real_codec=True`` requires PIL (absent in this container →
    ``NotImplementedError``); with PIL installed the real branch decodes the
    payload bytes (PNG/JPEG/…), converts to 8-bit grayscale, and emits the
    same (width, height, mean_byte, hist8) row. ``"auto"`` falls back to the
    fake path when PIL is missing; the default fake path parses the
    documented IMG1 header deterministically.
    """

    def __init__(self, *, use_real_codec: bool | str = False):
        self.real = _gate_codec(use_real_codec, _import_pil, "image decode")

    def _decode(self, p: bytes):
        """→ (width, height, uint8 pixel stream) or None for undecodable."""
        if self.real is not None:  # real codec branch (PIL present)
            import io

            try:
                with self.real.open(io.BytesIO(p)) as im:
                    w, h = im.size
                    px = np.asarray(im.convert("L"), dtype=np.uint8).ravel()
                return w, h, px
            except Exception:
                return None
        if len(p) < 8 or p[:4] != b"IMG1":
            return None
        w = int.from_bytes(p[4:6], "little")
        h = int.from_bytes(p[6:8], "little")
        return w, h, np.frombuffer(p[8:], dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means, hists = [], [], [], []
        for p in batch["payload"].to_pylist():
            dec = self._decode(p) if p is not None else None
            if dec is None:
                widths.append(None)
                heights.append(None)
                means.append(None)
                hists.append(None)
                continue
            w, h, px = dec
            widths.append(w)
            heights.append(h)
            means.append(float(px.mean()) if len(px) else 0.0)
            hist, _ = np.histogram(px, bins=8, range=(0, 256))
            hists.append((hist / max(1, len(px))).astype(np.float32).tolist())
        out = batch.drop_columns(["payload"])  # don't carry payloads forward
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        out = out.append_column("mean_byte", pa.array(means, pa.float64()))
        return out.append_column("feature", pa.array(hists, pa.list_(pa.float32())))


class AudioFeatureExtractor:
    """Audio-analog actor-pool stage: payload → (sample_rate, duration_s,
    rms, band_energy[8]) — an MFCC-ish fixed-width feature row per clip.

    ``use_real_codec=True`` requires soundfile (absent in this container →
    ``NotImplementedError``); with soundfile installed the real branch
    decodes the payload bytes (WAV/FLAC/OGG/…), mixes to mono, and computes
    the same (sample_rate, duration_s, rms, band_energy) row. ``"auto"``
    falls back when the codec is missing. The default fake path treats the
    payload body as deterministic int8 PCM at a fake 16 kHz rate, and the
    feature math (RMS + 8-band energy via a strided fold — a stand-in for a
    mel filterbank) is real vectorized numpy, so schema / batch-size /
    actor-pool plumbing are fully exercised.
    """

    FAKE_RATE = 16_000

    def __init__(self, *, use_real_codec: bool | str = False, n_bands: int = 8):
        self.n_bands = n_bands
        self.real = _gate_codec(use_real_codec, _import_soundfile, "audio decode")

    def _decode(self, p: bytes):
        """→ (float64 mono pcm in [-1, 1], rate) or None for undecodable."""
        if self.real is not None:  # real codec branch (soundfile present)
            import io

            try:
                data, rate = self.real.read(io.BytesIO(p), dtype="float64")
            except Exception:
                return None
            pcm = data.mean(axis=1) if getattr(data, "ndim", 1) > 1 else data
            return pcm, int(rate)
        body = p[8:]
        if not body:
            return None
        return np.frombuffer(body, dtype=np.int8).astype(np.float64) / 128.0, self.FAKE_RATE

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, durs, rms_out, bands_out = [], [], [], []
        nb = self.n_bands
        for p in batch["payload"].to_pylist():
            dec = self._decode(p) if p is not None else None
            if dec is None or not len(dec[0]):
                rates.append(None)
                durs.append(None)
                rms_out.append(None)
                bands_out.append(None)
                continue
            pcm, rate = dec
            rates.append(rate)
            durs.append(len(pcm) / rate)
            rms_out.append(float(np.sqrt(np.mean(pcm * pcm))))
            pad = (-len(pcm)) % nb
            folded = np.pad(pcm, (0, pad)).reshape(nb, -1)
            e = np.sqrt((folded * folded).mean(axis=1))
            bands_out.append(e.astype(np.float32).tolist())
        out = batch.drop_columns(["payload"])
        out = out.append_column("sample_rate", pa.array(rates, pa.int32()))
        out = out.append_column("duration_s", pa.array(durs, pa.float64()))
        out = out.append_column("rms", pa.array(rms_out, pa.float64()))
        return out.append_column("band_energy", pa.array(bands_out, pa.list_(pa.float32())))


class ImageResizer:
    """Actor-pool resize stage: payload → resized payload + dims.

    ``use_real_codec=True`` requires PIL (absent in this container →
    ``NotImplementedError``); with PIL installed the real branch decodes the
    payload, downsamples to at most ``target_w × target_h`` (aspect-free cap
    per axis, matching the fake path's contract), re-encodes as PNG, and
    emits the same output schema. ``"auto"`` falls back when PIL is missing.
    The default fake path does a REAL deterministic nearest-neighbor
    resample: the payload body is treated as the flattened pixel stream and
    sampled at ``target_w × target_h`` evenly-spaced indices (vectorized
    numpy take), emitting a new IMG1 payload — so batch sizing, payload
    lifecycle (input payload dropped, smaller output payload carried) and
    actor-pool plumbing are exercised end to end. Output dims are capped at
    the original dims (downsample-only), matching the oracle's
    ``least(width, target)``.
    """

    def __init__(self, *, target_w: int = 32, target_h: int = 32,
                 use_real_codec: bool | str = False):
        self.tw = int(target_w)
        self.th = int(target_h)
        self.real = _gate_codec(use_real_codec, _import_pil, "image resize")

    def _resize(self, p: bytes):
        """→ (w, h, out_w, out_h, payload bytes) or None for undecodable."""
        if self.real is not None:  # real codec branch (PIL present)
            import io

            try:
                with self.real.open(io.BytesIO(p)) as im:
                    w, h = im.size
                    rw, rh = min(self.tw, w), min(self.th, h)
                    buf = io.BytesIO()
                    im.resize((rw, rh)).save(buf, format="PNG")
                return w, h, rw, rh, buf.getvalue()
            except Exception:
                return None
        if len(p) < 8 or p[:4] != b"IMG1":
            return None
        w = int.from_bytes(p[4:6], "little")
        h = int.from_bytes(p[6:8], "little")
        px = np.frombuffer(p[8:], dtype=np.uint8)
        rw, rh = min(self.tw, w), min(self.th, h)
        n_out = rw * rh
        if len(px):
            idx = (np.arange(n_out, dtype=np.int64) * len(px)) // n_out
            out_px = px[idx]
        else:
            out_px = np.zeros(n_out, dtype=np.uint8)
        body = out_px.tobytes()
        return w, h, rw, rh, (
            b"IMG1" + rw.to_bytes(2, "little") + rh.to_bytes(2, "little") + body
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ows, ohs, rws, rhs, payloads, nbytes = [], [], [], [], [], []
        for p in batch["payload"].to_pylist():
            res = self._resize(p) if p is not None else None
            if res is None:
                ows.append(None)
                ohs.append(None)
                rws.append(None)
                rhs.append(None)
                payloads.append(None)
                nbytes.append(None)
                continue
            w, h, rw, rh, out_payload = res
            payloads.append(out_payload)
            ows.append(w)
            ohs.append(h)
            rws.append(rw)
            rhs.append(rh)
            nbytes.append(len(out_payload))
        out = batch.drop_columns(["payload", "n_bytes"])
        out = out.append_column("width", pa.array(ows, pa.int32()))
        out = out.append_column("height", pa.array(ohs, pa.int32()))
        out = out.append_column("out_w", pa.array(rws, pa.int32()))
        out = out.append_column("out_h", pa.array(rhs, pa.int32()))
        out = out.append_column("n_bytes_out", pa.array(nbytes, pa.int64()))
        return out.append_column("payload", pa.array(payloads, pa.binary()))


class FrameSampler:
    """Video-analog stage: sample ``n_frames`` evenly-spaced byte-slices from
    each payload (real codec would seek keyframes; structure is identical)."""

    def __init__(self, *, n_frames: int = 4, frame_bytes: int = 16):
        self.n = n_frames
        self.fb = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            body = (p or b"")[8:]
            if not body:
                continue
            for j in range(self.n):
                off = (j * max(1, len(body) - self.fb)) // max(1, self.n - 1) if self.n > 1 else 0
                ids.append(mid)
                frame_idx.append(j)
                frames.append(body[off : off + self.fb])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )
