"""Objective quality metrics (metrics.py) and the eval CLI command."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocodec_tpu import metrics
from audiocodec_tpu import __main__ as cli
from audiocodec_tpu.codec import Codec
from audiocodec_tpu.io.wav import write_wav


@pytest.fixture(scope="module")
def codec():
    return Codec.create(16000, filters_n=256, bark_bands_n=32)


def _tone(freq=440, sr=16000, blocks=16, n=256, amp=0.5):
    t = np.arange(blocks * n) / sr
    return jnp.asarray(
        (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None, :, None]
    )


class TestSNR:
    def test_identical_is_huge(self, codec):
        x = _tone()
        assert float(metrics.snr_db(x, x)) > 250.0

    def test_known_noise_level(self):
        x = _tone(amp=0.5)
        rng = np.random.default_rng(0)
        noise = jnp.asarray(
            (0.005 * rng.standard_normal(x.shape)).astype(np.float32)
        )
        got = float(metrics.snr_db(x, x + noise))
        sig = float(jnp.sum(x**2))
        npow = float(jnp.sum(noise**2))
        assert abs(got - 10 * np.log10(sig / npow)) < 0.01

    def test_segmental_punishes_one_bad_frame(self):
        """One destroyed frame: global SNR barely moves, segmental drops
        by its share — the metric's reason to exist."""
        x = _tone(blocks=64)
        bad = np.asarray(x).copy()
        bad[0, 1024 : 1024 + 256] = 0.0
        bad = jnp.asarray(bad)
        glob = float(metrics.snr_db(x, bad))
        seg = float(metrics.segmental_snr_db(x, bad, frame=256))
        clean_seg = float(metrics.segmental_snr_db(x, x, frame=256))
        assert (clean_seg - seg) > 0.5
        # the destroyed frame is 1/64 of the signal: global SNR stays high
        assert glob > 17.0


class TestNMR:
    def test_identical_is_zero(self, codec):
        x = _tone()
        assert float(metrics.nmr(codec, x, x)) == 0.0

    def test_codec_quantization_lands_near_calibration(self, codec):
        """The codec's own quantized round trip should land near the
        calibrated NMR of 1/36 (threshold/sqrt(3) step): well under 1."""
        x = _tone(blocks=32)
        y = codec.round_trip_quantized(x)[:, 256:-256]
        r = metrics.evaluate(codec, x, y)
        assert r["nmr"] < 0.2
        assert r["nmr_db"] < -7.0

    def test_nmr_sees_what_snr_cannot(self, codec):
        """Equal-power noise, different audibility: noise concentrated in
        ONE far-from-tone bin (unmasked) must score worse NMR than the
        same power spread under the masking skirt near the tone, at
        matched SNR."""
        x = _tone(freq=500, blocks=32)
        spec = codec.mdct.transform(x)
        ton = codec.psycho.tonality(spec)
        thr = np.asarray(codec.psycho.global_masking_threshold(spec, ton))
        # tone sits near bin 16 (500/16000*2*256); pick a masked bin next
        # to it and an unmasked far bin
        masked_bin = int(np.argmax(thr[0, 4]))
        far_bin = 200
        assert thr[0, 4, far_bin, 0] < thr[0, 4, masked_bin, 0] / 10
        power = 1e-4

        def with_noise(bin_idx):
            s = np.asarray(spec).copy()
            s[:, :, bin_idx] += np.sqrt(power)
            return codec.mdct.inverse_transform(jnp.asarray(s))[:, 256:-256]

        y_masked = with_noise(masked_bin)
        y_far = with_noise(far_bin)
        snr_m = float(metrics.snr_db(x, y_masked))
        snr_f = float(metrics.snr_db(x, y_far))
        assert abs(snr_m - snr_f) < 1.0  # same power: SNR can't tell
        nmr_m = float(metrics.nmr(codec, x, y_masked))
        nmr_f = float(metrics.nmr(codec, x, y_far))
        assert nmr_f > 10 * nmr_m  # NMR can

    def test_evaluate_contract(self, codec):
        x = _tone()
        with pytest.raises(ValueError, match="shapes differ"):
            metrics.evaluate(codec, x, x[:, :512])
        with pytest.raises(ValueError, match="multiple"):
            metrics.evaluate(codec, x[:, :100], x[:, :100])


class TestEvalCommand:
    def test_eval_roundtrip_quality(self, tmp_path):
        sr, n = 16000, 256
        t = np.arange(sr) / sr
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[:, None]
        ref = str(tmp_path / "ref.wav")
        write_wav(ref, x, sr)
        deg = str(tmp_path / "deg.wav")
        acz = str(tmp_path / "a.acz")
        assert cli.main(
            ["encode", ref, acz, "--filters-n", str(n),
             "--bark-bands-n", "32"]
        ) == 0
        assert cli.main(["decode", acz, deg]) == 0
        out = str(tmp_path / "out.json")
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main(
                ["eval", ref, deg, "--json", "--filters-n", str(n),
                 "--bark-bands-n", "32"]
            )
        assert rc == 0
        result = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert result["snr_db"] > 10.0
        # the 16-bit PCM wav floor alone registers ~NMR 1 under the
        # reference's dB_MAX=120 calibration (at 120 dB playback, -96
        # dBFS dither is marginally audible) — the codec's own error
        # adds little on top; see metrics.nmr's docstring
        assert result["nmr"] < 2.0
        assert result["sample_rate"] == sr

    def test_eval_rejects_rate_mismatch(self, tmp_path):
        a = str(tmp_path / "a16.wav")
        b = str(tmp_path / "b8.wav")
        write_wav(a, np.zeros((1024, 1), np.float32), 16000)
        write_wav(b, np.zeros((1024, 1), np.float32), 8000)
        assert cli.main(
            ["eval", a, b, "--filters-n", "256", "--bark-bands-n", "32"]
        ) == 1


class TestLoudness:
    """BS.1770 integrated loudness (metrics.loudness_lufs)."""

    def test_full_scale_sine_calibration(self):
        # the standard's calibration point: a full-scale 997 Hz sine
        # reads -3.01 LUFS (the -0.691 offset exists to make it so)
        sr = 48000
        t = np.arange(sr * 2) / sr
        x = np.sin(2 * np.pi * 997 * t).astype(np.float32)[None, :, None]
        assert abs(metrics.loudness_lufs(x, sr) - (-3.01)) < 0.15

    def test_level_tracks_gain(self):
        sr = 48000
        t = np.arange(sr * 2) / sr
        x = np.sin(2 * np.pi * 997 * t).astype(np.float32)[None, :, None]
        a = metrics.loudness_lufs(0.5 * x, sr)
        b = metrics.loudness_lufs(0.25 * x, sr)
        assert abs((a - b) - 6.02) < 0.1

    def test_rate_independent(self):
        for sr in (44100, 48000, 16000):
            t = np.arange(sr * 2) / sr
            x = (0.3 * np.sin(2 * np.pi * 997 * t)).astype(
                np.float32
            )[None, :, None]
            got = metrics.loudness_lufs(x, sr)
            assert abs(got - (-13.45)) < 0.2, (sr, got)

    def test_gating_ignores_silence(self):
        sr = 48000
        t = np.arange(sr * 2) / sr
        tone = (0.3 * np.sin(2 * np.pi * 997 * t)).astype(
            np.float32
        )[None, :, None]
        padded = np.concatenate([tone, np.zeros_like(tone)], axis=1)
        solo = metrics.loudness_lufs(tone, sr)
        gated = metrics.loudness_lufs(padded, sr)
        # ungated mean power would read 3 dB lower; the gate keeps it
        assert abs(gated - solo) < 0.5

    def test_k_weighting_highpass(self):
        # deep bass counts far less than mid frequencies at equal power
        sr = 48000
        t = np.arange(sr * 2) / sr
        mid = (0.3 * np.sin(2 * np.pi * 997 * t)).astype(
            np.float32
        )[None, :, None]
        bass = (0.3 * np.sin(2 * np.pi * 25 * t)).astype(
            np.float32
        )[None, :, None]
        # the RLB high-pass (f0=38 Hz, Q=0.5) attenuates 25 Hz by
        # ~10.5 dB per the standard's own response
        diff = metrics.loudness_lufs(mid, sr) - metrics.loudness_lufs(
            bass, sr
        )
        assert 8.0 < diff < 14.0, diff

    def test_stereo_sums_channels(self):
        sr = 48000
        t = np.arange(sr * 2) / sr
        mono = (0.3 * np.sin(2 * np.pi * 997 * t)).astype(
            np.float32
        )[None, :, None]
        stereo = np.repeat(mono, 2, axis=2)
        assert abs(
            metrics.loudness_lufs(stereo, sr)
            - metrics.loudness_lufs(mono, sr) - 3.01
        ) < 0.1
