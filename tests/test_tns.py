"""Temporal noise shaping tests: filter algebra, analysis gating, codec
integration, container plumbing, and the pre-echo claim itself.

The reference has no transient handling at all (its encode is
MDCT -> threshold -> noise -> iMDCT, /root/reference/audiocodec); TNS is
framework-added rate-distortion surface. Invariants under test:

* the forward/inverse filters are exact inverses (same quantized taps on
  both sides by construction);
* all-zero indices are the identity everywhere — analysis, filtering,
  step scaling, containers (byte-identical files);
* whatever the encoder wrote, the decoder reproduces from the container
  alone (indices + band start ride the bitstream);
* at a matched operating point the shaped path moves quantization noise
  out of the pre-attack window (the artifact TNS exists to fix).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodec_tpu import native, quantize, rate, tns
from audiocodec_tpu.codec import Codec
from audiocodec_tpu.io import bitstream
from audiocodec_tpu.io import stream_container as sc


def _click_train(sr=44100, blocks=64, n=1024, seed=3):
    """A castanet-like click train over a quiet tonal bed — the classic
    pre-echo victim (each click excites one frame whose noise smears
    across the whole synthesis window)."""
    rng = np.random.default_rng(seed)
    samples = blocks * n
    t = np.arange(samples) / sr
    sig = 0.02 * np.sin(2 * np.pi * 330 * t)
    clicks = []
    for s0 in range(9000, samples - 3000, 16384):
        clicks.append(s0)
        dt = np.arange(2000)
        burst = np.exp(-dt / 300.0) * rng.normal(size=2000)
        sig[s0 : s0 + 2000] += 0.8 * burst / np.max(np.abs(burst))
    return np.clip(sig, -1, 1).astype(np.float32), clicks


@pytest.fixture(scope="module")
def codec():
    return Codec.create(44100, filters_n=1024, bark_bands_n=64)


@pytest.fixture(scope="module")
def click(codec):
    sig, clicks = _click_train()
    x = jnp.asarray(sig[None, :, None])
    return sig, clicks, x, codec.mdct.transform(x)


class TestFilterAlgebra:
    def test_forward_inverse_identity(self):
        # indices up to |5| (|k| <= 0.83): the range Levinson-derived
        # filters actually occupy; |idx|=7 all-pole chains are ~1e7-gain
        # resonators where f32 roundoff amplification dominates any codec
        # use (analyze() never emits them for real spectra)
        rng = np.random.default_rng(0)
        spec = jnp.asarray(rng.normal(size=(2, 5, 256, 2)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(-5, 6, size=(2, 5, tns.ORDER, 2)), dtype=jnp.int8
        )
        bs = tns.default_band_start(256)
        back = tns.filter_inverse(tns.filter_forward(spec, idx, bs), idx, bs)
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(spec), atol=1e-4
        )

    def test_forward_inverse_identity_f64(self):
        rng = np.random.default_rng(1)
        spec = jnp.asarray(rng.normal(size=(1, 3, 128, 1)))
        assert spec.dtype == jnp.float64
        idx = jnp.asarray(
            rng.integers(-5, 6, size=(1, 3, tns.ORDER, 1)), dtype=jnp.int8
        )
        e = tns.filter_forward(spec, idx, 16)
        assert e.dtype == jnp.float64
        back = tns.filter_inverse(e, idx, 16)
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(spec), atol=1e-12
        )

    def test_zero_indices_are_exact_identity(self):
        rng = np.random.default_rng(2)
        spec = jnp.asarray(rng.normal(size=(1, 4, 128, 1)).astype(np.float32))
        z = jnp.zeros((1, 4, tns.ORDER, 1), dtype=jnp.int8)
        assert bool(jnp.all(tns.filter_forward(spec, z, 16) == spec))
        assert bool(jnp.all(tns.filter_inverse(spec, z, 16) == spec))
        thr = jnp.abs(spec) + 0.1
        assert bool(jnp.all(tns.scaled_threshold(thr, z, 16) == thr))

    def test_below_band_passes_through(self):
        rng = np.random.default_rng(3)
        spec = jnp.asarray(rng.normal(size=(1, 2, 128, 1)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(-5, 6, size=(1, 2, tns.ORDER, 1)), dtype=jnp.int8
        )
        e = tns.filter_forward(spec, idx, 32)
        np.testing.assert_array_equal(
            np.asarray(e[..., :32, :]), np.asarray(spec[..., :32, :])
        )

    def test_lpc_step_up_matches_direct_polynomial(self):
        # order-2 step-up has the closed form a1 = k1 (1 + k2), a2 = k2
        idx = jnp.zeros((1, 1, 2, 1), dtype=jnp.int8)
        idx = idx.at[0, 0, 0, 0].set(4).at[0, 0, 1, 0].set(-3)
        k = np.sin(np.array([4, -3]) * (np.pi / 2) / (tns.QMAX + 1))
        a = np.asarray(tns.lpc_from_indices(idx))[0, 0, :, 0]
        np.testing.assert_allclose(a[0], k[0] * (1 + k[1]), rtol=1e-6)
        np.testing.assert_allclose(a[1], k[1], rtol=1e-6)

    def test_step_scale_is_closed_form_gain(self):
        idx = jnp.asarray(
            np.array([3, -2, 1, 0, 0, 0, 0, 0], dtype=np.int8)
        ).reshape(1, 1, 8, 1)
        thr = jnp.ones((1, 1, 64, 1), dtype=jnp.float32)
        out = np.asarray(tns.scaled_threshold(thr, idx, 16))
        k = np.sin(np.array([3, -2, 1]) * (np.pi / 2) / (tns.QMAX + 1))
        want = np.sqrt(np.prod(1 - k * k)) ** tns.STEP_SCALE_EXP
        np.testing.assert_allclose(out[0, 0, 16:, 0], want, rtol=1e-6)
        np.testing.assert_array_equal(out[0, 0, :16, 0], 1.0)


class TestAnalysis:
    def test_white_spectrum_does_not_fire(self):
        rng = np.random.default_rng(0)
        spec = jnp.asarray(rng.normal(size=(2, 8, 512, 1)).astype(np.float32))
        idx = tns.analyze(spec, tns.default_band_start(512))
        assert int(jnp.sum(jnp.abs(idx))) == 0

    def test_silent_frames_do_not_fire(self):
        spec = jnp.zeros((1, 4, 256, 1), dtype=jnp.float32)
        idx = tns.analyze(spec, 16)
        assert int(jnp.sum(jnp.abs(idx))) == 0

    def test_envelope_frame_fires_and_whitens(self):
        # a frame whose MDCT is a decaying modulated comb — what a click
        # inside the frame produces — is highly predictable along k
        k = np.arange(1024, dtype=np.float32)
        frame = np.cos(0.3 * k) * np.exp(-(((k - 300) / 400.0) ** 2))
        spec = jnp.asarray(frame[None, None, :, None])
        bs = tns.default_band_start(1024)
        idx = tns.analyze(spec, bs)
        assert int(jnp.sum(jnp.abs(idx))) > 0
        e = tns.filter_forward(spec, idx, bs)
        before = float(jnp.sum(spec[..., bs:, :] ** 2))
        after = float(jnp.sum(e[..., bs:, :] ** 2))
        assert after < 0.2 * before  # strong whitening

    def test_band_must_exceed_order(self):
        spec = jnp.zeros((1, 1, 16, 1), dtype=jnp.float32)
        with pytest.raises(ValueError, match="band"):
            tns.analyze(spec, 10)


class TestCodecIntegration:
    def test_roundtrip_reconstructs(self, codec, click):
        sig, _, x, frames = click
        codes, bark, idx = codec.quantize_frames_tns(frames)
        dec = codec.decode_bitstream(codes, bark, tns_idx=idx)
        n = codec.mdct.filters_n
        rec = np.asarray(dec)[0, n:-n, 0]
        err = rec - sig
        snr = 10 * np.log10((sig**2).sum() / (err**2).sum())
        assert snr > 4.0  # quantized click train; ~5.7 dB nominal

    def test_pre_echo_and_rate_improve_at_matched_scale(self, codec, click):
        sig, clicks, x, frames = click
        sr, n = 44100, codec.mdct.filters_n
        ts = 4.0
        c0, b0 = codec.quantize_frames(frames, threshold_scale=ts)
        d0 = np.asarray(
            codec.decode_bitstream(c0, b0, threshold_scale=ts)
        )[0, n:-n, 0]
        c1, b1, idx = codec.quantize_frames_tns(frames, threshold_scale=ts)
        assert int(jnp.sum(jnp.abs(idx))) > 0
        d1 = np.asarray(
            codec.decode_bitstream(c1, b1, threshold_scale=ts, tns_idx=idx)
        )[0, n:-n, 0]
        e0, e1 = d0 - sig, d1 - sig
        w, g = int(0.012 * sr), int(0.001 * sr)
        pe0 = sum(float((e0[s - g - w : s - g] ** 2).sum()) for s in clicks)
        pe1 = sum(float((e1[s - g - w : s - g] ** 2).sum()) for s in clicks)
        # the headline claim: noise leaves the pre-attack window
        assert pe1 < 0.6 * pe0
        # and the whitened codes are cheaper to entropy-code
        r0 = len(native.rrice_encode(np.asarray(c0)))
        r1 = len(native.rrice_encode(np.asarray(c1)))
        assert r1 < r0
        # without giving up meaningful SNR (step-size gain compensation)
        snr = lambda e: 10 * np.log10((sig**2).sum() / (e**2).sum())
        assert snr(e1) > snr(e0) - 0.8

    def test_ms_tns_roundtrip(self, codec):
        rng = np.random.default_rng(5)
        sig, _ = _click_train(blocks=24)
        stereo = np.stack(
            [sig, 0.9 * sig + 0.01 * rng.normal(size=sig.size).astype(
                np.float32)], axis=-1
        )
        x = jnp.asarray(np.clip(stereo, -1, 1)[None])
        frames = codec.mdct.transform(x)
        codes, bark, idx = codec.quantize_frames_tns(frames, ms=True)
        dec = codec.decode_bitstream_ms(codes, bark, tns_idx=idx)
        n = codec.mdct.filters_n
        rec = np.asarray(dec)[0, n:-n]
        ref = np.asarray(x)[0, : rec.shape[0]]
        err = rec - ref
        snr = 10 * np.log10((ref**2).sum() / (err**2).sum())
        assert snr > 4.0

    def test_decoder_uses_container_band_start(self, codec, click):
        # a decoder built with different defaults must honor the band
        # start the ENCODER filtered from
        _, _, x, frames = click
        codes, bark, idx = codec.quantize_frames_tns(frames)
        a = codec.decode_bitstream(codes, bark, tns_idx=idx,
                                   tns_band_start=codec.tns_band_start)
        b = codec.decode_bitstream(codes, bark, tns_idx=idx)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestContainer:
    def _meta(self):
        return dict(
            sample_rate=44100, filters_n=1024, bark_bands_n=64, alpha=0.6,
            window_type="vorbis", compute_dtype="float32",
        )

    def test_pack_unpack_roundtrip(self, codec, click):
        _, _, x, frames = click
        codes, bark, idx = codec.quantize_frames_tns(frames)
        data = bitstream.pack(
            np.asarray(codes), np.asarray(bark),
            tns_idx=np.asarray(idx), tns_band_start=codec.tns_band_start,
            **self._meta(),
        )
        codes2, bark2, meta = bitstream.unpack(data)
        np.testing.assert_array_equal(codes2, np.asarray(codes))
        np.testing.assert_array_equal(meta["tns_idx"], np.asarray(idx))
        assert meta["tns_band_start"] == codec.tns_band_start
        # the decode driven purely by container contents matches direct
        dec_direct = codec.decode_bitstream(codes, bark, tns_idx=idx)
        dec_container = codec.decode_bitstream(
            jnp.asarray(codes2),
            jnp.asarray(bark2, dtype=jnp.bfloat16),
            tns_idx=jnp.asarray(meta["tns_idx"]),
            tns_band_start=meta["tns_band_start"],
        )
        np.testing.assert_array_equal(
            np.asarray(dec_direct), np.asarray(dec_container)
        )

    def test_all_zero_indices_write_no_member(self):
        codes = np.zeros((1, 3, 1024, 1), dtype=np.int32)
        bark = jnp.full((1, 3, 64, 1), 1e-6, dtype=jnp.bfloat16)
        plain = bitstream.pack(codes, np.asarray(bark), **self._meta())
        zero = bitstream.pack(
            codes, np.asarray(bark),
            tns_idx=np.zeros((1, 3, 8, 1), np.int8), tns_band_start=64,
            **self._meta(),
        )
        assert plain == zero
        _, _, meta = bitstream.unpack(zero)
        assert meta["tns_idx"] is None

    def test_mismatched_idx_shape_rejected_at_pack(self):
        codes = np.zeros((1, 3, 1024, 1), dtype=np.int32)
        bark = np.zeros((1, 3, 64, 1), dtype=np.uint16)
        with pytest.raises(ValueError, match="tns_idx shape"):
            bitstream.pack(
                codes, bark, tns_idx=np.ones((1, 2, 8, 1), np.int8),
                tns_band_start=64, **self._meta(),
            )

    def test_corrupt_tns_member_rejected_at_unpack(self, codec, click):
        import io as _io
        import zipfile

        _, _, x, frames = click
        codes, bark, idx = codec.quantize_frames_tns(frames)
        data = bitstream.pack(
            np.asarray(codes), np.asarray(bark),
            tns_idx=np.asarray(idx), tns_band_start=codec.tns_band_start,
            **self._meta(),
        )
        # rewrite the archive with a tampered tnsmeta (band_start = 2,
        # inside the filter order -> must be rejected before decode)
        src = zipfile.ZipFile(_io.BytesIO(data))
        out = _io.BytesIO()
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
            for name in src.namelist():
                payload = src.read(name)
                if name == "tnsmeta.npy":
                    arr = np.asarray([8, 2], dtype=np.int64)
                    buf = _io.BytesIO()
                    np.save(buf, arr)
                    payload = buf.getvalue()
                z.writestr(name, payload)
        with pytest.raises(ValueError, match="tns"):
            bitstream.unpack(out.getvalue())


class TestStream:
    def test_stream_matches_batch(self, codec, tmp_path):
        sig, clicks = _click_train(blocks=64)
        x = jnp.asarray(sig[None, :, None])
        path = str(tmp_path / "t.acs")
        n_chunks = sc.encode_stream(
            codec, x, path, chunk_blocks=16, tns=True, threshold_scale=2.0
        )
        assert n_chunks == 5
        with sc.StreamReader(path) as r:
            assert r.meta["tns"] == {
                "order": tns.ORDER,
                "band_start": codec.tns_band_start,
            }
            assert any(
                r.read_chunk(i)[2] is not None and (r.read_chunk(i)[2] != 0).any()
                for i in range(r.n_chunks)
            )
        outs = [np.asarray(c) for c in sc.decode_stream(codec, path)]
        stream_dec = np.concatenate(outs, axis=1)
        frames = codec.mdct.transform(x)
        codes, bark, idx = codec.quantize_frames_tns(
            frames, threshold_scale=2.0
        )
        batch_dec = np.asarray(
            codec.decode_bitstream(
                codes, bark, threshold_scale=2.0, tns_idx=idx
            )
        )
        # chunked analysis can flip a reflection index at a rounding
        # boundary (different XLA program shapes); the reconstruction
        # stays within quantization-noise scale of the batch path
        err = stream_dec[0, :, 0] - batch_dec[0, : stream_dec.shape[1], 0]
        sig_p = float((batch_dec**2).sum())
        assert float((err**2).sum()) < 1e-6 * sig_p

    def test_stream_seek_is_exact(self, codec, tmp_path):
        sig, _ = _click_train(blocks=64)
        x = jnp.asarray(sig[None, :, None])
        path = str(tmp_path / "t.acs")
        sc.encode_stream(codec, x, path, chunk_blocks=16, tns=True)
        full = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)], axis=1
        )
        part = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path,
                                                     start_chunk=2)],
            axis=1,
        )
        np.testing.assert_allclose(
            part, full[:, -part.shape[1] :], atol=1e-6
        )

    def test_tns_payload_corruption_detected(self, codec, tmp_path):
        sig, _ = _click_train(blocks=32)
        x = jnp.asarray(sig[None, :, None])
        path = str(tmp_path / "t.acs")
        sc.encode_stream(codec, x, path, chunk_blocks=16, tns=True)
        raw = bytearray(open(path, "rb").read())
        # flip a byte in the middle of the first chunk's payload region
        raw[len(raw) // 2] ^= 0xFF
        open(path, "wb").write(bytes(raw))
        with pytest.raises(ValueError):
            with sc.StreamReader(path) as r:
                for i in range(r.n_chunks):
                    r.read_chunk(i)

    def test_bad_header_tns_rejected(self, tmp_path):
        import json
        import struct

        path = str(tmp_path / "bad.acs")
        header = json.dumps(
            {
                "sample_rate": 44100, "filters_n": 1024,
                "bark_bands_n": 64, "alpha": 0.6, "window_type": "vorbis",
                "channels": 1, "compute_dtype": "float32",
                "tns": {"order": 64, "band_start": 8},
            }
        ).encode()
        with open(path, "wb") as f:
            f.write(b"ACS1" + struct.pack("<I", len(header)) + header)
            off = f.tell()
            f.write(struct.pack("<Q", off))
            f.write(struct.pack("<QQ", 0, off))
        with pytest.raises(ValueError, match="tns"):
            sc.StreamReader(path)


class TestRateControl:
    def test_rate_controlled_tns_container_decodes(self, codec):
        sig, _ = _click_train(blocks=32)
        x = jnp.asarray(sig[None, :, None])
        res = rate.encode_with_target_bitrate(codec, x, 64.0, tns=True)
        assert abs(res.kbps - 64.0) <= 0.1 * 64.0
        codes, bark, meta = bitstream.unpack(res.packed)
        assert meta["tns_idx"] is not None
        dec = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, dtype=jnp.bfloat16),
            threshold_scale=meta["threshold_scale"],
            dz_recon=meta["dz_recon"],
            tns_idx=jnp.asarray(meta["tns_idx"]),
            tns_band_start=meta["tns_band_start"],
        )
        n = codec.mdct.filters_n
        rec = np.asarray(dec)[0, n:-n, 0]
        err = rec - sig
        snr = 10 * np.log10((sig**2).sum() / (err**2).sum())
        assert np.isfinite(snr) and snr > 0.0


class TestCLI:
    def test_encode_decode_tns(self, tmp_path):
        import audiocodec_tpu.__main__ as cli
        from audiocodec_tpu.io.wav import read_wav, write_wav

        sig, _ = _click_train(blocks=32)
        wav = str(tmp_path / "in.wav")
        write_wav(wav, sig[:, None], 44100)
        acz = str(tmp_path / "out.acz")
        dec = str(tmp_path / "dec.wav")
        assert cli.main(["encode", wav, acz, "--tns"]) == 0
        _, _, meta = bitstream.load(acz)
        assert meta["tns_idx"] is not None
        assert cli.main(["decode", acz, dec]) == 0
        out, rate_hz = read_wav(dec)
        assert rate_hz == 44100
        err = out[: sig.size, 0] - sig[: out.shape[0]]
        snr = 10 * np.log10((sig**2).sum() / (err**2).sum())
        assert snr > 4.0
        assert cli.main(["info", acz]) == 0
