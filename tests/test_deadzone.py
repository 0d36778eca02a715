"""Dead-zone quantizer tests: bin geometry, reconstruction offset, and the
container plumbing (``dzr``) that makes encode/decode agree.

The reference has no quantizer at all (its lossy step is noise injection,
audiocodec/psychoacoustic.py:151-167); the dead zone is framework-added
rate-distortion surface. Invariant under test: a container written with any
deadzone decodes correctly because the reconstruction offset rides the
container, and deadzone=0.5 containers are byte-identical to pre-dead-zone
encoders.
"""

import json
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from audiocodec_tpu import native, quantize, rate
from audiocodec_tpu.codec import Codec
from audiocodec_tpu.io import bitstream


@pytest.fixture(scope="module")
def codec():
    return Codec.create(16000, filters_n=64, bark_bands_n=16)


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(7)
    t = np.arange(24 * 64) / 16000
    wave = (
        0.5 * np.sin(2 * np.pi * 500 * t)
        + 0.1 * rng.normal(size=t.size)
    ).astype(np.float32)
    return jnp.asarray(np.clip(wave, -1, 1)[None, :, None])


class TestQuantizeGeometry:
    def test_half_deadzone_is_plain_rounding(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 3, 8, 1)).astype(np.float32))
        thr = jnp.full_like(x, 0.3)
        plain, d0 = quantize.quantize(x, thr)
        dz, d1 = quantize.quantize(x, thr, deadzone=0.5)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(dz))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    @pytest.mark.parametrize("z", [0.75, 1.0, 1.5])
    def test_bin_edges(self, z):
        # nonzero bin c occupies u in [z + c - 1, z + c); the zero bin is
        # (-z, z). Probe just inside/outside every edge for |c| <= 3.
        eps = 1e-3
        us, want = [], []
        for c in range(0, 4):
            lo = z + c - 1.0
            if c == 0:
                us += [0.0, z - eps]
                want += [0, 0]
            else:
                us += [lo + eps, z + c - eps]
                want += [c, c]
        u = np.asarray(us, dtype=np.float64)
        x = jnp.asarray(np.concatenate([u, -u])[None, None, :, None])
        # threshold sqrt(3) -> step size exactly 1
        thr = jnp.full_like(x, np.sqrt(3.0))
        codes, delta = quantize.quantize(x, thr, deadzone=z)
        np.testing.assert_allclose(np.asarray(delta), 1.0, rtol=1e-12)
        expect = np.concatenate([want, -np.asarray(want)])
        np.testing.assert_array_equal(
            np.asarray(codes).ravel(), expect.astype(np.int32)
        )

    def test_deadzone_out_of_range_rejected(self):
        x = jnp.zeros((1, 1, 2, 1))
        with pytest.raises(ValueError):
            quantize.quantize(x, jnp.ones_like(x), deadzone=0.4)
        with pytest.raises(ValueError):
            quantize.quantize(x, jnp.ones_like(x), deadzone=2.5)

    def test_wider_zone_zeroes_more(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 4, 64, 1)).astype(np.float32))
        thr = jnp.full_like(x, 1.0)
        c_half = np.asarray(quantize.quantize(x, thr, deadzone=0.5)[0])
        c_wide = np.asarray(quantize.quantize(x, thr, deadzone=1.0)[0])
        assert (c_wide == 0).sum() > (c_half == 0).sum()
        # and never flips sign of a surviving code
        both = (c_half != 0) & (c_wide != 0)
        assert np.all(np.sign(c_half[both]) == np.sign(c_wide[both]))


class TestReconOffset:
    def test_zero_offset_is_plain(self):
        codes = jnp.asarray(np.arange(-3, 4)[None, None, :, None])
        delta = jnp.full(codes.shape, 0.25, dtype=jnp.float32)
        out = quantize.dequantize(codes, delta, recon_offset=0.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(codes) * 0.25, rtol=0
        )

    def test_offset_applies_signed(self):
        codes = jnp.asarray(np.asarray([-2, -1, 0, 1, 2])[None, None, :, None])
        delta = jnp.ones(codes.shape, dtype=jnp.float64)
        rho = 0.35
        out = np.asarray(quantize.dequantize(codes, delta, recon_offset=rho))
        np.testing.assert_allclose(
            out.ravel(), [-2.35, -1.35, 0.0, 1.35, 2.35], atol=1e-12
        )

    @pytest.mark.parametrize("z", [0.75, 1.0, 1.5])
    def test_roundtrip_error_bounded_by_bin(self, z):
        # with the matching offset, every reconstructed value lies inside
        # its own bin, so |x - x_hat| < max(z, 1) * delta
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 2, 256, 1)) * 3.0)
        thr = jnp.full_like(x, np.sqrt(3.0))  # delta = 1
        codes, delta = quantize.quantize(x, thr, deadzone=z)
        rho = quantize.dz_recon_offset(z)
        xh = np.asarray(quantize.dequantize(codes, delta, recon_offset=rho))
        assert np.max(np.abs(np.asarray(x) - xh)) < max(z, 1.0) + 1e-9

    def test_offset_formula(self):
        assert quantize.dz_recon_offset(0.5) == 0.0
        assert quantize.dz_recon_offset(0.75) == pytest.approx(0.25)
        # past 0.75 the recon point drops to 0.45
        assert quantize.dz_recon_offset(1.0) == pytest.approx(0.45)
        assert quantize.dz_recon_offset(1.0, recon_point=0.5) == pytest.approx(
            0.5
        )


class TestResolveDeadzone:
    def test_explicit_passthrough(self):
        assert rate.resolve_deadzone(0.8, 999.0, 2, 44100) == 0.8
        assert rate.resolve_deadzone("0.8", 999.0, 2, 44100) == 0.8

    def test_auto_rate_ladder(self):
        # per-channel kbps normalized to 44.1k: high rate -> plain rounding
        assert rate.resolve_deadzone("auto", 256.0, 2, 44100) == 0.5
        assert rate.resolve_deadzone("auto", 96.0 * 2, 2, 44100) == 0.7
        assert rate.resolve_deadzone("auto", 64.0, 1, 44100) == 0.9
        assert rate.resolve_deadzone("auto", 40.0, 1, 44100) == 1.0
        # lower sample rate raises the normalized rate
        assert rate.resolve_deadzone("auto", 64.0, 1, 16000) == 0.5

    def test_out_of_range_rejected(self):
        with pytest.raises(ValueError):
            rate.resolve_deadzone(3.0, 64.0, 1, 44100)


@pytest.mark.skipif(not native.available(), reason="needs the Rice coder")
class TestContainerPlumbing:
    def test_acz_roundtrip_carries_dzr(self, codec, signal):
        z = 1.0
        codes, bark = codec.encode_bitstream(signal, deadzone=z)
        rho = quantize.dz_recon_offset(z)
        blob = bitstream.pack(
            codes, bark, sample_rate=16000, filters_n=64, bark_bands_n=16,
            alpha=0.6, window_type="vorbis", dz_recon=rho,
        )
        c2, b2, meta = bitstream.unpack(blob)
        assert meta["dz_recon"] == pytest.approx(rho)
        wave = codec.decode_bitstream(
            jnp.asarray(c2), jnp.asarray(b2, dtype=jnp.bfloat16),
            dz_recon=meta["dz_recon"],
        )
        n = 64
        ref = np.asarray(signal)
        err = np.asarray(wave)[:, n : n + ref.shape[1]] - ref
        snr = 10 * np.log10(np.mean(ref**2) / np.mean(err**2))
        assert snr > 10.0

    def test_plain_container_has_no_dzr_member(self, codec, signal):
        codes, bark = codec.encode_bitstream(signal)
        blob = bitstream.pack(
            codes, bark, sample_rate=16000, filters_n=64, bark_bands_n=16,
            alpha=0.6, window_type="vorbis", dz_recon=0.0,
        )
        import io as _io
        import zipfile

        with zipfile.ZipFile(_io.BytesIO(blob)) as zf:
            assert "dzr.npy" not in zf.namelist()
        _, _, meta = bitstream.unpack(blob)
        assert meta["dz_recon"] == 0.0

    def test_recon_offset_beats_plain_at_wide_zone(self, codec, signal):
        # decoding a wide-dead-zone stream WITHOUT the offset reconstructs
        # every bin at its lower edge -> measurably worse
        z = 1.25
        codes, bark = codec.encode_bitstream(signal, deadzone=z)
        rho = quantize.dz_recon_offset(z)

        def snr(dzr):
            wave = codec.decode_bitstream(codes, bark, dz_recon=dzr)
            n = 64
            ref = np.asarray(signal)
            err = np.asarray(wave)[:, n : n + ref.shape[1]] - ref
            return 10 * np.log10(np.mean(ref**2) / np.mean(err**2))

        assert snr(rho) > snr(0.0) + 1.0

    def test_corrupt_dzr_rejected(self, codec, signal):
        codes, bark = codec.encode_bitstream(signal)
        blob = bitstream.pack(
            codes, bark, sample_rate=16000, filters_n=64, bark_bands_n=16,
            alpha=0.6, window_type="vorbis", dz_recon=1.0,
        )
        import io as _io
        import zipfile

        buf = _io.BytesIO()
        with zipfile.ZipFile(_io.BytesIO(blob)) as zin, zipfile.ZipFile(
            buf, "w", zipfile.ZIP_DEFLATED
        ) as zout:
            for name in zin.namelist():
                data = zin.read(name)
                if name == "dzr.npy":
                    data = data.replace(
                        np.asarray([1.0]).tobytes(),
                        np.asarray([50.0]).tobytes(),
                    )
                zout.writestr(name, data)
        with pytest.raises(ValueError, match="dzr"):
            bitstream.unpack(buf.getvalue())


@pytest.mark.skipif(not native.available(), reason="needs the Rice coder")
class TestStreamPlumbing:
    def test_acs_roundtrip_with_deadzone(self, codec, signal, tmp_path):
        from audiocodec_tpu.io import stream_container as sc

        path = str(tmp_path / "dz.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8, deadzone=0.9)
        with open(path, "rb") as f:
            f.read(4)
            (hlen,) = struct.unpack("<I", f.read(4))
            header = json.loads(f.read(hlen))
        assert header["dzr"] == pytest.approx(quantize.dz_recon_offset(0.9))
        chunks = [np.asarray(s) for s in sc.decode_stream(codec, path)]
        wave = np.concatenate(chunks, axis=1)
        n = 64
        ref = np.asarray(signal)
        err = wave[:, n : n + ref.shape[1]] - ref
        snr = 10 * np.log10(np.mean(ref**2) / np.mean(err**2))
        assert snr > 10.0

    def test_plain_stream_header_unchanged(self, codec, signal, tmp_path):
        from audiocodec_tpu.io import stream_container as sc

        path = str(tmp_path / "plain.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8)
        with open(path, "rb") as f:
            f.read(4)
            (hlen,) = struct.unpack("<I", f.read(4))
            header = json.loads(f.read(hlen))
        assert "dzr" not in header

    def test_corrupt_stream_dzr_rejected(self, codec, signal, tmp_path):
        from audiocodec_tpu.io import stream_container as sc

        path = str(tmp_path / "bad.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8, deadzone=0.9)
        with open(path, "rb") as f:
            magic = f.read(4)
            (hlen,) = struct.unpack("<I", f.read(4))
            header = json.loads(f.read(hlen))
            rest = f.read()
        with open(path, "rb") as f:
            f.read(8)
            old_len = hlen
        header["dzr"] = 99.0
        hb = json.dumps(header).encode()
        # the chunk index stores absolute offsets — keep the header length
        # byte-identical (JSON tolerates trailing spaces inside the object)
        assert len(hb) <= old_len
        hb = hb[:-1] + b" " * (old_len - len(hb)) + b"}"
        bad = str(tmp_path / "bad2.acs")
        with open(bad, "wb") as f:
            f.write(magic + struct.pack("<I", len(hb)) + hb + rest)
        with pytest.raises(ValueError, match="dzr"):
            with sc.StreamReader(bad):
                pass


@pytest.mark.skipif(not native.available(), reason="needs the Rice coder")
class TestRateControlDeadzone:
    def test_low_rate_auto_picks_wide_zone(self):
        # filters_n=256: the bark sidecar of the module codec (N=64) alone
        # outweighs a 24 kbps budget
        codec = Codec.create(16000, filters_n=256, bark_bands_n=32)
        rng = np.random.default_rng(3)
        t = np.arange(2 * 16000) / 16000
        wave = np.clip(
            0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.15 * rng.normal(size=t.size),
            -1, 1,
        ).astype(np.float32)
        wave = wave[: wave.size // 256 * 256]
        clip = jnp.asarray(wave[None, :, None])
        res = rate.encode_with_target_bitrate(codec, clip, 24.0)
        # 24 kbps mono at 16 kHz normalizes to ~66 kbps/ch at 44.1k -> 0.9
        assert res.dz_recon == pytest.approx(quantize.dz_recon_offset(0.9))
        codes, bark, meta = bitstream.unpack(res.packed)
        assert meta["dz_recon"] == pytest.approx(res.dz_recon)
        # rate accuracy itself is test_rate's job; allow slack here
        assert abs(res.kbps - 24.0) <= 0.20 * 24.0
        wave_out = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, dtype=jnp.bfloat16),
            threshold_scale=res.threshold_scale, dz_recon=meta["dz_recon"],
        )
        assert np.all(np.isfinite(np.asarray(wave_out)))
