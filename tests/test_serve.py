"""Dynamic-batching codec server (serve.py)."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from audiocodec_tpu import serve
from audiocodec_tpu.codec import Codec
from audiocodec_tpu.io import bitstream
from audiocodec_tpu.io.wav import read_wav_bytes, write_wav_bytes


N = 64
SR = 16000


@pytest.fixture(scope="module")
def codec():
    return Codec.create(SR, filters_n=N, bark_bands_n=16)


@pytest.fixture()
def server(codec):
    with serve.CodecServer(
        codec, SR, port=0, max_batch=8, max_wait_ms=50.0, min_blocks=4
    ) as s:
        yield s


def _wav_blob(blocks=8, freq=440, amp=0.5, channels=1, seed=None):
    t = np.arange(blocks * N) / SR
    x = amp * np.sin(2 * np.pi * freq * t)
    if seed is not None:
        x = x + 0.01 * np.random.default_rng(seed).standard_normal(t.size)
    x = np.repeat(x[:, None], channels, axis=1).astype(np.float32)
    return write_wav_bytes(x, SR), x


def _jit_encode(codec, x):
    """The server's exact encode program (one jitted composition).

    Identity claims must compare against the SAME compiled program:
    jit-composed vs eager-method encode can differ by ±1 code at a
    rounding boundary (different XLA fusion), which is a different but
    equally valid encoding — decode derives step sizes from the sidecar,
    never by re-running the encoder's float chain."""
    import jax

    @jax.jit
    def enc(c, x):
        return c.quantize_frames(c.mdct.transform(x))

    return enc(codec, x)


class TestEncodeServing:
    def test_container_byte_identical_to_offline(self, codec, server):
        """The served container equals the offline (same-program) encode
        of the SAME 16-bit-quantized audio — batching is invisible."""
        blob, _ = _wav_blob(blocks=8)
        with serve.Client(port=server.port) as c:
            got = c.encode(blob)
        wave, rate = read_wav_bytes(blob)
        x = jnp.asarray(wave, jnp.float32)
        codes, bark = _jit_encode(codec, x)
        from audiocodec_tpu import native

        # the server pins its coder (default rrice) instead of "auto" —
        # dual costing per response is the wrong serving trade
        want = bitstream.pack(
            codes, bark, sample_rate=SR, filters_n=N,
            bark_bands_n=16, alpha=codec.psycho.alpha,
            window_type=codec.mdct.window_type,
            compute_dtype="float32", ms=False,
            bark_precision=codec.psycho.bark_precision,
            entropy="rrice" if native.available() else "zlib",
            # the server records the codec's sidecar grid (scq.py)
            sidecar_grid=codec.sidecar_grid,
            # the server records the exact request length (gapless)
            orig_samples=wave.shape[1],
        )
        assert got == want

    def test_gapless_round_trip(self, codec, server):
        """A request whose length is NOT a block multiple round-trips
        through encode + decode at its EXACT length (the server pads the
        tail and records nsamp)."""
        samples = 5 * N + 37
        t = np.arange(samples) / SR
        x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[:, None]
        blob = write_wav_bytes(x, SR)
        with serve.Client(port=server.port) as c:
            acz = c.encode(blob)
            wav_out = c.decode(acz)
        _, _, meta = bitstream.unpack(acz)
        assert meta["orig_samples"] == samples
        y, rate = read_wav_bytes(wav_out)
        assert rate == SR
        assert y.shape[1] == samples

    def test_padding_trim_is_bit_exact(self, codec, server):
        """A clip whose block count is NOT the bucket size (5 blocks in
        an 8-block bucket) still produces the unpadded clip's exact
        codes: an MDCT frame depends only on blocks i-1/i and the pad
        blocks are zeros."""
        blob, _ = _wav_blob(blocks=5, freq=700)
        with serve.Client(port=server.port) as c:
            got = c.encode(blob)
        codes, bark, meta = bitstream.unpack(got)
        assert codes.shape[1] == 6  # blocks+1, not bucket+1
        wave, _ = read_wav_bytes(blob)
        w_codes, w_bark = _jit_encode(codec, jnp.asarray(wave, jnp.float32))
        np.testing.assert_array_equal(codes, np.asarray(w_codes))
        np.testing.assert_array_equal(
            np.asarray(bark).view(np.uint16),
            np.asarray(w_bark).view(np.uint16),
        )

    def test_concurrent_requests_batch(self, server):
        """Four concurrent clients with assorted lengths: all answers
        correct, and the batcher grouped them (fewer batches than
        requests)."""
        blobs = [
            _wav_blob(blocks=b, freq=300 + 100 * i, seed=i)[0]
            for i, b in enumerate((5, 6, 7, 8))
        ]
        results = [None] * len(blobs)

        def worker(i):
            with serve.Client(port=server.port) as c:
                results[i] = c.encode(blobs[i])

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(blobs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(r is not None for r in results)
        for i, r in enumerate(results):
            codes, _, _ = bitstream.unpack(r)
            assert codes.shape[1] == (5, 6, 7, 8)[i] + 1
        with serve.Client(port=server.port) as c:
            stats = c.stats()
        assert stats["encode_requests"] >= 4
        assert stats["encode_batches"] < stats["encode_requests"]

    def test_decode_round_trip_through_server(self, codec, server):
        blob, x = _wav_blob(blocks=8, amp=0.4)
        with serve.Client(port=server.port) as c:
            acz = c.encode(blob)
            wav = c.decode(acz)
        wave, rate = read_wav_bytes(wav)
        assert rate == SR
        assert wave.shape[1] == x.shape[0]
        # served decode == direct decode (through the same 16-bit egress)
        codes, bark, _ = bitstream.unpack(acz)
        direct = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, dtype=jnp.bfloat16)
        )
        direct = np.asarray(direct.astype(jnp.float32))[:, N:-N]
        expected, _ = read_wav_bytes(write_wav_bytes(direct[0], SR))
        np.testing.assert_array_equal(wave, expected)


class TestDecodeHonorsContainerMeta:
    def test_scaled_ms_tns_nf_container(self, codec, server):
        """A container carrying EVERY quantization-affecting field (rate
        scale, joint stereo, dead zone, TNS, noise fill) must decode
        through the server exactly as the offline decoder would — the
        served decode path honors the recorded meta, not defaults."""
        import jax

        rng = np.random.default_rng(3)
        t = np.arange(16 * N) / SR
        x = 0.4 * np.sin(2 * np.pi * 440 * t)[:, None]
        x = np.concatenate([x, 0.3 * rng.standard_normal((t.size, 1))],
                           axis=1).astype(np.float32)
        xj = jnp.asarray(x[None])

        @jax.jit
        def enc(c, xx):
            return c.quantize_frames_tns(
                xx, threshold_scale=8.0, ms=True, deadzone=1.0, nf=True
            )

        codes, bark, tns_idx, nfl = enc(codec, codec.mdct.transform(xj))
        from audiocodec_tpu import quantize as q

        blob = bitstream.pack(
            np.asarray(codes), np.asarray(bark),
            sample_rate=SR, filters_n=N, bark_bands_n=16,
            alpha=codec.psycho.alpha, window_type="vorbis",
            ms=True, threshold_scale=8.0,
            dz_recon=q.dz_recon_offset(1.0),
            tns_idx=np.asarray(tns_idx),
            tns_band_start=codec.tns_band_start,
            nf_levels=np.asarray(nfl), nf_band_start=codec.nf_band_start,
            nf_seed=4,
        )
        with serve.Client(port=server.port) as c:
            wav = c.decode(blob)
        wave, rate = read_wav_bytes(wav)
        # Reference: the SAME bucketed jitted program the server runs
        # (jit-composed vs eager can differ by one PCM LSB at rounding
        # boundaries — CLAUDE.md), but with every meta field passed
        # EXPLICITLY. If the server drops or mangles any recorded field
        # on its unpack -> kwargs path, the bytes diverge; the float
        # program itself is shared, so the comparison stays bit-exact.
        frames = np.asarray(codes).shape[1]
        bucket = 32  # server: max(min_blocks + 1, next_pow2(17))
        pad = ((0, 0), (0, bucket - frames), (0, 0), (0, 0))
        direct = server._dec(
            codec,
            jnp.asarray(np.pad(np.asarray(codes), pad)),
            jnp.asarray(np.pad(np.asarray(bark), pad),
                        dtype=jnp.bfloat16),
            8.0, ms=True, dzr=q.dz_recon_offset(1.0),
            tns=jnp.asarray(np.pad(np.asarray(tns_idx), pad)),
            tns_bs=codec.tns_band_start,
            nfl=jnp.asarray(np.pad(np.asarray(nfl),
                                   (pad[0], pad[1], pad[3]))),
            nf_bs=codec.nf_band_start, nf_seed=np.uint32(4),
        )
        direct = np.asarray(direct.astype(jnp.float32))[
            :, N : N + (frames - 1) * N
        ]
        expected, _ = read_wav_bytes(write_wav_bytes(direct[0], SR))
        np.testing.assert_array_equal(wave, expected)

    def test_mismatched_dtype_rejected(self, server):
        blob, _ = _wav_blob(blocks=8)
        with serve.Client(port=server.port) as c:
            acz = c.encode(blob)
        codes, bark, meta = bitstream.unpack(acz)
        evil = bitstream.pack(
            codes, bark, sample_rate=SR, filters_n=N, bark_bands_n=16,
            alpha=meta["alpha"], window_type="vorbis",
            compute_dtype="float64",
        )
        with serve.Client(port=server.port) as c:
            with pytest.raises(RuntimeError, match="different codec"):
                c.decode(evil)


class TestStreamingSessions:
    def test_session_bytes_equal_offline_acs(self, codec, server,
                                             tmp_path):
        """header + chunk + ... + tail from a session must be BYTE-
        identical to offline encode_stream of the concatenated PCM."""
        from audiocodec_tpu.io import stream_container as sc

        rng = np.random.default_rng(9)
        chunks = 4
        x = (0.3 * rng.standard_normal((1, chunks * 8 * N, 1))).astype(
            np.float32
        )
        parts = []
        with serve.Client(port=server.port) as c:
            parts.append(c.begin_stream(channels=1, chunk_blocks=8,
                                        nf=True))
            for k in range(chunks):
                parts.append(c.feed(x[0, k * 8 * N : (k + 1) * 8 * N]))
            parts.append(c.finish_stream())
        streamed = b"".join(parts)

        offline = str(tmp_path / "off.acs")
        sc.encode_stream(codec, jnp.asarray(x), offline, chunk_blocks=8,
                         nf=True)
        assert streamed == open(offline, "rb").read()

    def test_session_intensity_bytes_equal_offline(self, codec, server,
                                                   tmp_path):
        """An intensity-stereo session reproduces the offline .acs
        byte-for-byte (the per-chunk image gains included)."""
        from audiocodec_tpu.io import stream_container as sc

        rng = np.random.default_rng(33)
        chunks = 3
        t = np.arange(chunks * 8 * N) / SR
        mono = 0.3 * np.sin(2 * np.pi * 6500 * t) + 0.05 * (
            rng.standard_normal(t.size)
        )
        x = np.stack([mono, 0.3 * mono], axis=-1).astype(
            np.float32
        )[None]
        parts = []
        with serve.Client(port=server.port) as c:
            parts.append(c.begin_stream(channels=2, chunk_blocks=8,
                                        ms=True, intensity=True))
            for k in range(chunks):
                parts.append(c.feed(x[0, k * 8 * N : (k + 1) * 8 * N]))
            parts.append(c.finish_stream())
        streamed = b"".join(parts)

        offline = str(tmp_path / "offis.acs")
        sc.encode_stream(codec, jnp.asarray(x), offline, chunk_blocks=8,
                         ms=True, intensity=True)
        assert streamed == open(offline, "rb").read()

    def test_session_dtx_bytes_equal_offline(self, codec, server,
                                             tmp_path):
        """A DTX session gates its silent chunks into the same silent
        records as offline encode_stream (clear-margin content, so the
        host/device RMS roundoff cannot flip a decision) and the bytes
        match exactly."""
        from audiocodec_tpu.io import stream_container as sc

        rng = np.random.default_rng(44)
        chunks = 6
        cs = 8 * N
        t = np.arange(chunks * cs) / SR
        sig = np.zeros(chunks * cs, np.float32)
        sig[: 2 * cs] = 0.4 * np.sin(2 * np.pi * 440 * t[: 2 * cs])
        sig[2 * cs : 5 * cs] = 5e-5 * rng.standard_normal(3 * cs)
        sig[5 * cs :] = 0.3 * np.sin(2 * np.pi * 660 * t[5 * cs :])
        x = sig[None, :, None]
        parts = []
        with serve.Client(port=server.port) as c:
            parts.append(c.begin_stream(channels=1, chunk_blocks=8,
                                        dtx=-70.0))
            for k in range(chunks):
                parts.append(c.feed(x[0, k * cs : (k + 1) * cs]))
            parts.append(c.finish_stream())
        streamed = b"".join(parts)
        assert streamed[:4] == b"ACS3"

        offline = str(tmp_path / "offdtx.acs")
        sc.encode_stream(codec, jnp.asarray(x), offline, chunk_blocks=8,
                         dtx=-70.0)
        assert streamed == open(offline, "rb").read()

    def test_session_dtx_first_chunk_silent_equals_offline(
            self, codec, server, tmp_path):
        """A stream that OPENS with silence gates its first chunk just
        like offline encode_stream (gate[0] = below[0], no hangover
        precondition) — a call that starts quiet must not spend
        full-rate bits on chunk 0."""
        from audiocodec_tpu.io import stream_container as sc

        rng = np.random.default_rng(45)
        chunks = 4
        cs = 8 * N
        t = np.arange(chunks * cs) / SR
        sig = np.zeros(chunks * cs, np.float32)
        sig[: 2 * cs] = 5e-5 * rng.standard_normal(2 * cs)
        sig[2 * cs :] = 0.4 * np.sin(2 * np.pi * 440 * t[2 * cs :])
        x = sig[None, :, None]
        parts = []
        with serve.Client(port=server.port) as c:
            parts.append(c.begin_stream(channels=1, chunk_blocks=8,
                                        dtx=-70.0))
            for k in range(chunks):
                parts.append(c.feed(x[0, k * cs : (k + 1) * cs]))
            parts.append(c.finish_stream())
        streamed = b"".join(parts)

        offline = str(tmp_path / "offdtx0.acs")
        sc.encode_stream(codec, jnp.asarray(x), offline, chunk_blocks=8,
                         dtx=-70.0)
        assert streamed == open(offline, "rb").read()
        # and the opening chunks really are ~13-byte silent records
        with sc.StreamReader(offline) as r:
            assert r.read_chunk(0).silent is not None
            assert r.read_chunk(1).silent is not None

    def test_decode_session_dtx_matches_offline(self, codec, server,
                                                tmp_path):
        """A live decode session of a DTX stream reproduces offline
        decode_stream sample-for-sample, comfort noise included."""
        from audiocodec_tpu.io import stream_container as sc

        rng = np.random.default_rng(45)
        chunks = 6
        cs = 8 * N
        t = np.arange(chunks * cs) / SR
        sig = np.zeros(chunks * cs, np.float32)
        sig[: 2 * cs] = 0.4 * np.sin(2 * np.pi * 440 * t[: 2 * cs])
        sig[2 * cs : 5 * cs] = 5e-5 * rng.standard_normal(3 * cs)
        sig[5 * cs :] = 0.3 * np.sin(2 * np.pi * 660 * t[5 * cs :])
        x = jnp.asarray(sig[None, :, None])
        path = str(tmp_path / "ld.acs")
        sc.encode_stream(codec, x, path, chunk_blocks=8, dtx=-70.0)
        offline = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )[0, :, 0]

        blob = open(path, "rb").read()
        import struct as _struct

        (_, index_off) = _struct.unpack("<QQ", blob[-16:])
        with sc.StreamReader(path) as r:
            offs = list(r._index)
        ends = offs[1:] + [index_off]
        live = []
        with serve.Client(port=server.port) as c:
            c.begin_decode_stream(blob[: offs[0]])
            for off, end in zip(offs, ends):
                live.append(c.feed_chunk(blob[off:end])[:, 0])
            live.append(c.finish_decode_stream()[:, 0])
        live = np.concatenate(live)
        np.testing.assert_allclose(live, offline, atol=1e-6)

    def test_session_dtx_cbr_rejected(self, server):
        with serve.Client(port=server.port) as c:
            with pytest.raises(Exception, match="dtx|cbr"):
                c.begin_stream(channels=1, chunk_blocks=8, dtx=-70.0,
                               cbr=True)

    def test_session_tmask_bytes_equal_offline(self, codec, server,
                                               tmp_path):
        """The session's rolling temporal-masking context reproduces the
        offline tmask .acs byte-for-byte."""
        from audiocodec_tpu.io import stream_container as sc

        rng = np.random.default_rng(21)
        chunks = 3
        x = (0.05 * rng.standard_normal((1, chunks * 8 * N, 1))).astype(
            np.float32
        )
        x[0, 2 * N : 3 * N, 0] += 0.8  # an attack whose shadow spans chunks
        parts = []
        with serve.Client(port=server.port) as c:
            parts.append(c.begin_stream(channels=1, chunk_blocks=8,
                                        tmask=400.0))
            for k in range(chunks):
                parts.append(c.feed(x[0, k * 8 * N : (k + 1) * 8 * N]))
            parts.append(c.finish_stream())
        streamed = b"".join(parts)

        offline = str(tmp_path / "offtm.acs")
        sc.encode_stream(codec, jnp.asarray(x), offline, chunk_blocks=8,
                         tmask=400.0)
        assert streamed == open(offline, "rb").read()

    def test_adaptive_cbr_session_matches_offline(self, codec, server,
                                                   tmp_path):
        """An adaptive session feeding per-chunk scales produces a CBR
        .acs byte-identical to offline encode_stream with the same
        scale list — network-adaptive streaming rides the existing
        format."""
        from audiocodec_tpu.io import stream_container as sc

        rng = np.random.default_rng(17)
        chunks = 4
        scales = [1.5, 4.0, 16.0, 2.0]
        x = (0.3 * rng.standard_normal((1, chunks * 8 * N, 1))).astype(
            np.float32
        )
        parts = []
        with serve.Client(port=server.port) as c:
            # non-default cfg scale: a feed WITHOUT an explicit scale
            # must fall back to it, and the header must still record
            # 1.0 (cbr streams carry scales per chunk) so the bytes
            # equal offline encode_stream with the same scale list
            parts.append(c.begin_stream(channels=1, chunk_blocks=8,
                                        cbr=True, threshold_scale=1.5))
            parts.append(c.feed(x[0, : 8 * N]))  # default -> 1.5
            for k in range(1, chunks):
                parts.append(c.feed(
                    x[0, k * 8 * N : (k + 1) * 8 * N],
                    threshold_scale=scales[k],
                ))
            parts.append(c.finish_stream())
        streamed = b"".join(parts)

        offline = str(tmp_path / "cbr.acs")
        sc.encode_stream(codec, jnp.asarray(x), offline, chunk_blocks=8,
                         threshold_scale=scales)
        assert streamed == open(offline, "rb").read()
        # coarser chunks really are smaller (the adaptive knob works)
        import io as _io

        with sc.StreamReader(_io.BytesIO(streamed)) as r:
            assert r.meta.get("cbr")
            sizes = [
                (r._index[i + 1] - r._index[i])
                for i in range(chunks - 1)
            ]
        assert sizes[2] < sizes[0]  # scale 16 chunk < scale 1 chunk

    def test_adaptive_scale_requires_cbr_session(self, server):
        with serve.Client(port=server.port) as c:
            c.begin_stream(channels=1, chunk_blocks=4)
            with pytest.raises(RuntimeError, match="cbr session"):
                c.feed(np.zeros((4 * N, 1), np.float32),
                       threshold_scale=4.0)
            c.finish_stream()

    def test_session_protocol_errors(self, server):
        with serve.Client(port=server.port) as c:
            with pytest.raises(RuntimeError, match="no active"):
                c.feed(b"\x00" * 16)
            with pytest.raises(RuntimeError, match="no active"):
                c.finish_stream()
            c.begin_stream(channels=1, chunk_blocks=4)
            with pytest.raises(RuntimeError, match="already active"):
                c.begin_stream(channels=1, chunk_blocks=4)
            with pytest.raises(RuntimeError, match="float32 PCM"):
                c.feed(b"\x00" * 16)  # wrong size
            # the session survives a bad chunk and still finishes
            c.feed(np.zeros((4 * N, 1), np.float32))
            tail = c.finish_stream()
            assert len(tail) > 0
            # a normal request still works on the same connection
            blob, _ = _wav_blob(blocks=4)
            assert len(c.encode(blob)) > 0

    def test_decode_session_matches_offline(self, codec, server,
                                            tmp_path):
        """Feeding a real .acs file's chunks through a decode session
        reproduces offline decode_stream sample-exactly."""
        from audiocodec_tpu.io import stream_container as sc

        rng = np.random.default_rng(13)
        x = (0.3 * rng.standard_normal((1, 4 * 8 * N, 1))).astype(
            np.float32
        )
        path = str(tmp_path / "d.acs")
        sc.encode_stream(codec, jnp.asarray(x), path, chunk_blocks=8,
                         nf=True, threshold_scale=2.0)
        raw = open(path, "rb").read()
        with sc.StreamReader(path) as r:
            offs = list(r._index)
            hdr = raw[: offs[0]]
            ends = offs[1:] + [None]
        offline = np.concatenate(
            [np.asarray(c.astype(jnp.float32))
             for c in sc.decode_stream(codec, path)], axis=1
        )[0]
        with serve.Client(port=server.port) as c:
            meta = c.begin_decode_stream(hdr)
            assert meta["channels"] == 1
            parts = []
            for off, end in zip(offs, ends):
                end = end if end is not None else None
                chunk_bytes = raw[off:end] if end else None
                if chunk_bytes is None:
                    # last chunk runs to the index; find it from meta
                    import struct as _struct

                    (n_chunks, index_off) = _struct.unpack(
                        "<QQ", raw[-16:]
                    )
                    chunk_bytes = raw[off:index_off]
                parts.append(c.feed_chunk(chunk_bytes))
            parts.append(c.finish_decode_stream())
        streamed = np.concatenate(parts, axis=0)
        np.testing.assert_array_equal(streamed, offline)

    def test_decode_session_rejects_mismatched_header(self, server):
        import json as _json
        import struct as _struct

        hdr_meta = {
            "sample_rate": 8000, "filters_n": N, "bark_bands_n": 16,
            "alpha": 0.6, "window_type": "vorbis", "channels": 1,
            "compute_dtype": "float32", "ms": False,
            "threshold_scale": 1.0, "bark_precision": "highest",
            "coder": "rrice", "hcrc": 1,
        }
        blob = _json.dumps(hdr_meta).encode()
        hdr = b"ACS1" + _struct.pack("<I", len(blob)) + blob
        with serve.Client(port=server.port) as c:
            with pytest.raises(RuntimeError, match="different codec"):
                c.begin_decode_stream(hdr)

    def test_concurrent_sessions_are_per_connection(self, server):
        rng = np.random.default_rng(11)
        pcm = [
            (0.3 * rng.standard_normal((4 * N, 1))).astype(np.float32)
            for _ in range(2)
        ]
        with serve.Client(port=server.port) as a, \
                serve.Client(port=server.port) as b:
            ha = a.begin_stream(channels=1, chunk_blocks=4)
            hb = b.begin_stream(channels=1, chunk_blocks=4)
            ca = a.feed(pcm[0])
            cb = b.feed(pcm[1])
            ta = a.finish_stream()
            tb = b.finish_stream()
        # both sessions produce decodable, independent streams
        from audiocodec_tpu.io import stream_container as sc

        import tempfile
        for parts in ((ha, ca, ta), (hb, cb, tb)):
            f = tempfile.NamedTemporaryFile(suffix=".acs", delete=False)
            f.write(b"".join(parts))
            f.close()
            with sc.StreamReader(f.name) as r:
                assert r.n_chunks == 2


class TestServingErrors:
    def test_error_keeps_connection_alive(self, server):
        with serve.Client(port=server.port) as c:
            with pytest.raises(RuntimeError, match="RIFF"):
                c.encode(b"this is not a wav")
            # connection still serves afterwards
            blob, _ = _wav_blob(blocks=4)
            assert len(c.encode(blob)) > 0

    def test_rate_mismatch_rejected(self, server):
        t = np.arange(8 * N) / 8000
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[:, None]
        blob = write_wav_bytes(x, 8000)
        with serve.Client(port=server.port) as c:
            with pytest.raises(RuntimeError, match="resample"):
                c.encode(blob)

    def test_too_short_rejected(self, server):
        blob = write_wav_bytes(np.zeros((N // 2, 1), np.float32), SR)
        with serve.Client(port=server.port) as c:
            with pytest.raises(RuntimeError, match="block"):
                c.encode(blob)

    def test_decode_of_garbage_rejected(self, server):
        with serve.Client(port=server.port) as c:
            with pytest.raises(RuntimeError):
                c.decode(b"not a container")

    def test_unknown_opcode(self, server):
        with pytest.raises(RuntimeError, match="opcode"):
            serve.request("X", b"", port=server.port)


class TestUnixSocket:
    def test_unix_socket_serving(self, codec, tmp_path):
        path = str(tmp_path / "acx.sock")
        with serve.CodecServer(codec, SR, unix_path=path, min_blocks=4):
            blob, _ = _wav_blob(blocks=4)
            out = serve.request("E", blob, unix_path=path)
            codes, _, _ = bitstream.unpack(out)
            assert codes.shape[1] == 5


class TestInt16Wire:
    """Round 4's transport-lean encode path (serve._enc_i16): PCM16
    requests ship int16 and come back as one flat int16 buffer. The
    contract is byte-identity with the float ingress for PCM16, correct
    fallback for every other wire, and a working int32 escape when codes
    overflow int16."""

    def test_float_wav_request_uses_float_path(self, codec, server):
        # 32-bit PCM WAV: read_wav_i16_bytes returns None, so the server
        # takes the float ingress; result must equal the offline float
        # encode of the same decoded samples
        t = np.arange(8 * N) / SR
        x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)[:, None]
        blob = write_wav_bytes(x, SR, width=4)
        from audiocodec_tpu.io.wav import read_wav_bytes

        wave_f, rate = read_wav_bytes(blob)
        assert rate == SR
        with serve.Client(port=server.port) as c:
            out = c.encode(blob)
        codes, bark, _ = bitstream.unpack(out)
        w_codes, w_bark = _jit_encode(codec, jnp.asarray(wave_f, jnp.float32))
        np.testing.assert_array_equal(codes, np.asarray(w_codes))

    def test_read_wav_i16_bytes_dispatch(self):
        from audiocodec_tpu.io.wav import read_wav_i16_bytes

        x = (np.sin(2 * np.pi * 440 * np.arange(2048) / SR) * 20000
             ).astype(np.float32)[:, None]
        pcm16 = write_wav_bytes(x / 32768.0 * 0.6, SR, width=2)
        got = read_wav_i16_bytes(pcm16)
        assert got is not None and got[0].dtype == np.int16
        assert got[1] == SR
        pcm32 = write_wav_bytes(x / 32768.0 * 0.6, SR, width=4)
        assert read_wav_i16_bytes(pcm32) is None

    def test_unpack_i16_overflow_falls_back_to_int32(self, codec, server):
        # fabricate a handle whose fits flag is 0: _unpack_i16 must
        # recompute via the float/int32 path and return exact int32 codes
        import jax

        g, bucket, ch = 1, 4, 1
        x = np.zeros((g, bucket * N, ch), dtype=np.int16)
        x[0, : 2 * N, 0] = (
            np.sin(2 * np.pi * 440 * np.arange(2 * N) / SR) * 20000
        ).astype(np.int16)
        fake = jax.device_put(
            np.zeros(g * (bucket + 1) * N * ch
                     + g * (bucket + 1) * codec.psycho.bark_bands_n * ch
                     + 1, dtype=np.int16)
        )
        codes_h, bark_h = server._unpack_i16((fake, x), g, bucket, ch)
        assert codes_h.dtype == np.int32
        xf = x.astype(np.float32) / 32768.0
        w_codes, w_bark = server._enc(codec, jnp.asarray(xf, jnp.float32))
        np.testing.assert_array_equal(codes_h, np.asarray(w_codes))

    def test_i16_wire_equals_float_wire_bytes(self, codec, server):
        # the SAME samples sent as PCM16 and PCM32 must produce
        # identical containers (int16/32768 dequant is exact in f32)
        t = np.arange(8 * N) / SR
        x16 = (np.sin(2 * np.pi * 220 * t) * 12000).astype(np.int16)
        xf = (x16.astype(np.float32) / 32768.0)[:, None]
        import io as _io
        import wave as _wave

        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(SR)
            f.writeframes(x16.tobytes())
        pcm16_blob = buf.getvalue()
        with serve.Client(port=server.port) as c:
            out16 = c.encode(pcm16_blob)
        codes, bark, _ = bitstream.unpack(out16)
        w_codes, _ = _jit_encode(codec, jnp.asarray(xf[None], jnp.float32))
        np.testing.assert_array_equal(codes, np.asarray(w_codes))
