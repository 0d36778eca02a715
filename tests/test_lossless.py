"""Lossless archival mode (lossless.py).

The reference has no lossless path (its encode is masked noise
injection, SURVEY.md §0) — this is framework-added surface. The
contract under test is absolute: decode(encode(x)) == x bit-for-bit,
for every signal class, depth, channel count, and length, plus the
container-hardening guarantees shared with the lossy bitstream."""

import io
import zipfile

import numpy as np
import pytest

from audiocodec_tpu import lossless
from audiocodec_tpu.io import wav


def _roundtrip(x, rate=44100, bits=16, frame=lossless.DEFAULT_FRAME):
    blob = lossless.encode_lossless(x, rate, bits=bits, frame=frame)
    y, rate2, bits2 = lossless.decode_lossless(blob)
    assert rate2 == rate and bits2 == bits
    np.testing.assert_array_equal(np.asarray(x, np.int32).reshape(y.shape), y)
    return blob


class TestRoundTrip:
    def test_sine_mono(self):
        t = np.arange(44100) / 44100
        x = (20000 * np.sin(2 * np.pi * 440 * t)).astype(np.int32)[:, None]
        blob = _roundtrip(x)
        # tonal content is highly predictable: far below half of PCM
        assert len(blob) < 0.25 * x.size * 2

    def test_correlated_stereo_picks_mid_side(self):
        rng = np.random.default_rng(0)
        t = np.arange(44100 * 2) / 44100
        l = (12000 * np.sin(2 * np.pi * 440 * t)
             + rng.normal(0, 60, t.size)).astype(np.int32)
        r = (l * 0.9 + rng.normal(0, 40, t.size)).astype(np.int32)
        x = np.stack([l, r], axis=1)
        blob = _roundtrip(x)
        assert lossless.describe(blob)["stereo_mode"] == "mid/side"

    def test_independent_stereo_stays_lr(self):
        # loud left + near-silent right: m/s would smear the loud channel
        # into BOTH mid and side, so independent coding clearly wins
        rng = np.random.default_rng(1)
        t = np.arange(30000) / 44100
        l = (rng.normal(0, 8000, t.size)).astype(np.int32)
        r = rng.integers(-8, 8, size=t.size, dtype=np.int32)
        blob = _roundtrip(np.stack([l, r], axis=1))
        assert lossless.describe(blob)["stereo_mode"] == "independent"

    def test_white_noise_never_expands_much(self):
        rng = np.random.default_rng(2)
        x = rng.integers(-32768, 32767, size=(50000, 2), dtype=np.int16)
        blob = _roundtrip(x)
        # verbatim escape bounds the worst case at container overhead
        assert len(blob) < 1.01 * x.size * 2
        assert lossless.describe(blob)["entropy"] == "verbatim"

    def test_silence_is_tiny(self):
        x = np.zeros((100000, 2), dtype=np.int16)
        blob = _roundtrip(x)
        assert len(blob) < 2000

    def test_constant_dc(self):
        x = np.full((10000, 1), -12345, dtype=np.int32)
        _roundtrip(x)

    def test_ramp_prefers_higher_order(self):
        x = (np.arange(20000, dtype=np.int32) % 30000 - 15000)[:, None]
        blob = _roundtrip(x)
        assert len(blob) < 0.1 * x.size * 2

    @pytest.mark.parametrize("n", [1, 37, 255, 256, 4095, 4096, 4097, 9000])
    def test_lengths_not_multiple_of_frame(self, n):
        rng = np.random.default_rng(n)
        x = rng.integers(-500, 500, size=(n, 1), dtype=np.int16)
        _roundtrip(x)

    def test_full_scale_extremes(self):
        x = np.tile(np.asarray([[32767], [-32768]], np.int32), (3000, 1))
        _roundtrip(x)

    def test_24_bit(self):
        rng = np.random.default_rng(3)
        t = np.arange(48000) / 48000
        l = (4_000_000 * np.sin(2 * np.pi * 220 * t)
             + rng.normal(0, 800, t.size)).astype(np.int32)
        r = (l + rng.normal(0, 500, t.size)).astype(np.int32)
        _roundtrip(np.stack([l, r], axis=1), rate=48000, bits=24)

    def test_24_bit_extremes(self):
        hi, lo = (1 << 23) - 1, -(1 << 23)
        x = np.tile(np.asarray([[hi], [lo]], np.int32), (2000, 1))
        _roundtrip(x, bits=24)

    def test_multichannel(self):
        rng = np.random.default_rng(4)
        x = rng.integers(-300, 300, size=(10000, 6), dtype=np.int16)
        _roundtrip(x)

    def test_small_frame(self):
        rng = np.random.default_rng(5)
        x = rng.integers(-300, 300, size=(3000, 1), dtype=np.int16)
        _roundtrip(x, frame=256)

    def test_batch_leading_axis_accepted(self):
        x = np.zeros((1, 5000, 2), dtype=np.int16)
        blob = lossless.encode_lossless(x, 16000)
        y, _, _ = lossless.decode_lossless(blob)
        assert y.shape == (5000, 2)

    def test_per_frame_stereo_mixed_halves(self):
        """Halves favoring different pairings must go per-frame AND stay
        bit-exact — the round-3 regression shipped because no test
        covered a stream whose argmin mixes stereo modes."""
        rng = np.random.default_rng(7)
        n = 44100
        t = np.arange(n) / 44100
        # first half: independent loud-left / quiet-right -> l/r (or l/side)
        l1 = np.clip(rng.normal(0, 8000, n), -32000, 32000).astype(np.int32)
        r1 = rng.integers(-6, 6, size=n, dtype=np.int32)
        # second half: strongly correlated tonal -> mid/side
        l2 = (12000 * np.sin(2 * np.pi * 330 * t)
              + rng.normal(0, 50, n)).astype(np.int32)
        r2 = (l2 + rng.normal(0, 30, n)).astype(np.int32)
        x = np.stack(
            [np.concatenate([l1, l2]), np.concatenate([r1, r2])], axis=1
        )
        blob = _roundtrip(x)
        assert lossless.describe(blob)["stereo_mode"] == "per-frame"

    def test_per_frame_left_side_and_side_right(self):
        """Composites that favor the asymmetric pairings: one loud noisy
        channel + one near-copy channel makes side tiny, so l/side (or
        side/r) beats both l/r and m/s; flipping which channel leads per
        half exercises modes 2 and 3 in ONE stream."""
        rng = np.random.default_rng(8)
        n = 40960
        a1 = np.clip(rng.normal(0, 7000, n), -32000, 32000).astype(np.int32)
        b1 = a1 + rng.integers(-3, 3, size=n, dtype=np.int32)
        b2 = np.clip(rng.normal(0, 7000, n), -32000, 32000).astype(np.int32)
        a2 = b2 + rng.integers(-3, 3, size=n, dtype=np.int32)
        x = np.stack(
            [np.concatenate([a1, a2]), np.concatenate([b1, b2])], axis=1
        )
        blob = _roundtrip(x)
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            names = zf.namelist()
            if "smodes.npy" in names:
                with zf.open("smodes.npy") as f:
                    smodes = np.load(f)
                # both asymmetric modes must round-trip when present
                assert set(np.unique(smodes)) <= {0, 1, 2, 3}

    def test_24_bit_stereo_odd_frame_count(self):
        """Regression for the b4c972a power-of-two bucketing: a frame
        count that is NOT a power of two (here 11 frames of 4096) with
        24-bit correlated stereo must stay bit-exact."""
        rng = np.random.default_rng(9)
        n = 10 * 4096 + 1234  # 11 frames, last partial
        t = np.arange(n) / 48000
        l = (3_500_000 * np.sin(2 * np.pi * 180 * t)
             + rng.normal(0, 700, n)).astype(np.int32)
        r = (l + rng.normal(0, 400, n)).astype(np.int32)
        _roundtrip(np.stack([l, r], axis=1), rate=48000, bits=24)

    def test_all_orders_selected_somewhere(self):
        """A composite signal should exercise several predictor orders —
        the selection argmin is real, not a constant."""
        rng = np.random.default_rng(6)
        parts = [
            np.full(8192, 777),                                  # constant
            rng.integers(-32000, 32000, 8192),                   # noise
            (20000 * np.sin(2 * np.pi * 440 *
                            np.arange(8192) / 44100)),           # tonal
            np.arange(8192) % 4000,                              # ramps
        ]
        x = np.concatenate(parts).astype(np.int32)[:, None]
        blob = _roundtrip(x)
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            with zf.open("orders.npy") as f:
                orders = np.load(f)
        assert len(np.unique(orders)) >= 3


class TestValidation:
    def test_rejects_float(self):
        with pytest.raises(ValueError, match="integer PCM"):
            lossless.encode_lossless(
                np.zeros((100, 1), np.float32), 44100
            )

    def test_rejects_out_of_range(self):
        with pytest.raises(ValueError, match="16-bit range"):
            lossless.encode_lossless(
                np.full((100, 1), 40000, np.int32), 44100, bits=16
            )

    def test_rejects_32_bit(self):
        with pytest.raises(ValueError, match="bits"):
            lossless.encode_lossless(
                np.zeros((100, 1), np.int32), 44100, bits=32
            )

    def test_rejects_empty(self):
        with pytest.raises(ValueError):
            lossless.encode_lossless(np.zeros((0, 1), np.int32), 44100)

    def test_rejects_bad_frame(self):
        with pytest.raises(ValueError, match="frame"):
            lossless.encode_lossless(
                np.zeros((100, 1), np.int16), 44100, frame=1000
            )


def _tamper_lmeta(blob, **overrides):
    """Rewrite header fields of a valid container (attacker model)."""
    src = zipfile.ZipFile(io.BytesIO(blob))
    out = io.BytesIO()
    fields = ["version", "sample_rate", "channels", "n_samples", "frame",
              "bits", "stereo_mode", "entropy"]
    with zipfile.ZipFile(out, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "lmeta.npy":
                arr = np.load(io.BytesIO(data))
                for k, v in overrides.items():
                    arr[fields.index(k)] = v
                buf = io.BytesIO()
                np.save(buf, arr)
                data = buf.getvalue()
            dst.writestr(name, data)
    return out.getvalue()


class TestHardening:
    @pytest.fixture()
    def blob(self):
        rng = np.random.default_rng(7)
        x = rng.integers(-500, 500, size=(9000, 2), dtype=np.int16)
        return lossless.encode_lossless(x, 44100)

    def test_garbage_bytes(self):
        # the contract (shared with io/bitstream.unpack) is ValueError,
        # whatever np.load's message: never a raw zipfile/KeyError
        with pytest.raises(ValueError):
            lossless.decode_lossless(b"not a container at all")

    def test_truncated(self, blob):
        with pytest.raises(ValueError):
            lossless.decode_lossless(blob[: len(blob) // 2])

    def test_bit_flip_anywhere_never_crashes_raw(self, blob):
        rng = np.random.default_rng(8)
        for _ in range(20):
            pos = int(rng.integers(0, len(blob)))
            bad = bytearray(blob)
            bad[pos] ^= 0xFF
            try:
                lossless.decode_lossless(bytes(bad))
            except ValueError:
                pass  # the contract: ValueError or a successful decode

    @pytest.mark.parametrize("field,value", [
        ("version", 99), ("channels", 0), ("channels", 1000),
        ("n_samples", 0), ("n_samples", 1 << 62), ("frame", 7),
        ("frame", 1 << 30), ("bits", 32), ("stereo_mode", 5),
        ("entropy", 9), ("sample_rate", 0),
    ])
    def test_tampered_header_fields(self, blob, field, value):
        with pytest.raises(ValueError):
            lossless.decode_lossless(_tamper_lmeta(blob, **{field: value}))

    def test_declared_bomb_rejected_before_allocation(self, blob):
        # huge n_samples from a small residual stream must be refused by
        # the values-per-byte bound, not attempted
        bad = _tamper_lmeta(blob, n_samples=1 << 38)
        with pytest.raises(ValueError):
            lossless.decode_lossless(bad)

    def test_describe_matches_decode_validation(self, blob):
        d = lossless.describe(blob)
        assert d["channels"] == 2 and d["bits"] == 16
        with pytest.raises(ValueError):
            lossless.describe(_tamper_lmeta(blob, frame=7))

    def test_deflated_payload_tamper(self):
        # force a deflated-family container (tonal -> raw16+deflate),
        # then corrupt the deflate stream itself
        t = np.arange(12000) / 44100
        x = (20000 * np.sin(2 * np.pi * 440 * t)).astype(np.int32)[:, None]
        blob = lossless.encode_lossless(x, 44100)
        assert "deflate" in lossless.describe(blob)["entropy"]
        src = zipfile.ZipFile(io.BytesIO(blob))
        out = io.BytesIO()
        with zipfile.ZipFile(out, "w") as dst:
            for name in src.namelist():
                data = src.read(name)
                if name == "res.npy":
                    data = data[:-40]  # truncate the deflate stream
                dst.writestr(name, data)
        with pytest.raises(ValueError):
            lossless.decode_lossless(out.getvalue())

    def test_entropy_width_mismatch(self, blob):
        # claim a raw-width family on a Rice payload: byte count check
        # must refuse before any frombuffer reshape
        for code in (5, 6, 7):
            bad = _tamper_lmeta(blob, entropy=code)
            with pytest.raises(ValueError):
                lossless.decode_lossless(bad)

    def test_sniff(self, blob):
        assert lossless.is_lossless_bytes(blob)
        assert not lossless.is_lossless_bytes(b"RIFF....WAVE")


class TestIntWavIO:
    def test_wav_int_roundtrip_16(self, tmp_path):
        rng = np.random.default_rng(9)
        x = rng.integers(-32768, 32767, size=(5000, 2), dtype=np.int16)
        p = str(tmp_path / "a.wav")
        wav.write_wav_int(p, x.astype(np.int32), 44100, 16)
        y, rate, bits = wav.read_wav_int(p)
        assert (rate, bits) == (44100, 16)
        np.testing.assert_array_equal(x.astype(np.int32), y)

    def test_wav_int_roundtrip_24(self, tmp_path):
        rng = np.random.default_rng(10)
        x = rng.integers(-(1 << 23), (1 << 23) - 1, size=(3000, 1))
        p = str(tmp_path / "b.wav")
        wav.write_wav_int(p, x.astype(np.int32), 48000, 24)
        y, rate, bits = wav.read_wav_int(p)
        assert (rate, bits) == (48000, 24)
        np.testing.assert_array_equal(x.astype(np.int32), y)

    def test_float_wav_refused(self, tmp_path):
        p = str(tmp_path / "f.wav")
        wav.write_wav(p, np.zeros((100, 1)), 44100)  # int16 output: fine
        wav.read_wav_int(p)
        # hand-build a float32 WAV
        import struct
        pcm = np.zeros(100, np.float32).tobytes()
        hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 44100,
                                       44100 * 4, 4, 32)
               + b"data" + struct.pack("<I", len(pcm)))
        fp = str(tmp_path / "g.wav")
        with open(fp, "wb") as f:
            f.write(hdr + pcm)
        with pytest.raises(ValueError, match="float32"):
            wav.read_wav_int(fp)

    def test_int_wav_matches_float_ingress_scale(self, tmp_path):
        """The int reader and the float reader must describe the SAME
        samples (float = int / 2^(bits-1))."""
        rng = np.random.default_rng(11)
        x = rng.integers(-32768, 32767, size=(2000, 1), dtype=np.int16)
        p = str(tmp_path / "c.wav")
        wav.write_wav_int(p, x.astype(np.int32), 44100, 16)
        xi, _, _ = wav.read_wav_int(p)
        xf, _ = wav.read_wav(p, dtype=np.float64)
        np.testing.assert_allclose(xf[0, :, :], xi / 32768.0, atol=0)


class TestCLI:
    def test_encode_decode_info(self, tmp_path, capsys):
        import audiocodec_tpu.__main__ as cli

        rng = np.random.default_rng(12)
        t = np.arange(22050) / 44100
        l = (9000 * np.sin(2 * np.pi * 330 * t)
             + rng.normal(0, 30, t.size)).astype(np.int32)
        x = np.stack([l, (l // 2)], axis=1)
        src = str(tmp_path / "in.wav")
        enc = str(tmp_path / "out.acz")
        dst = str(tmp_path / "out.wav")
        wav.write_wav_int(src, x, 44100, 16)
        assert cli.main(["encode", src, enc, "--lossless"]) == 0
        assert "lossless" in capsys.readouterr().out
        assert cli.main(["info", enc]) == 0
        assert "(lossless)" in capsys.readouterr().out
        assert cli.main(["decode", enc, dst]) == 0
        y, rate, bits = wav.read_wav_int(dst)
        assert (rate, bits) == (44100, 16)
        np.testing.assert_array_equal(x, y)

    def test_decode_start_duration_exact_slice(self, tmp_path):
        import audiocodec_tpu.__main__ as cli

        rng = np.random.default_rng(13)
        x = rng.integers(-500, 500, size=(44100, 1), dtype=np.int16)
        src = str(tmp_path / "in.wav")
        enc = str(tmp_path / "o.acz")
        dst = str(tmp_path / "o.wav")
        wav.write_wav_int(src, x.astype(np.int32), 44100, 16)
        assert cli.main(["encode", src, enc, "--lossless"]) == 0
        assert cli.main(["decode", enc, dst, "--start", "0.25",
                         "--duration", "0.5"]) == 0
        y, _, _ = wav.read_wav_int(dst)
        np.testing.assert_array_equal(
            x[11025:11025 + 22050].astype(np.int32), y
        )

    def test_lossy_flags_refused(self, tmp_path, capsys):
        import audiocodec_tpu.__main__ as cli

        src = str(tmp_path / "in.wav")
        wav.write_wav_int(src, np.zeros((4096, 1), np.int32), 44100, 16)
        rc = cli.main(["encode", src, str(tmp_path / "o.acz"),
                       "--lossless", "--kbps", "64"])
        assert rc != 0
        assert "lossy" in capsys.readouterr().err

    def test_corpus_lossless_roundtrip(self, tmp_path):
        """Bulk archival: corpus --lossless on mixed rates/depths/
        lengths, then corpus-decode restores every file bit-exactly."""
        import audiocodec_tpu.__main__ as cli

        rng = np.random.default_rng(14)
        indir = tmp_path / "in"
        outdir = tmp_path / "enc"
        recdir = tmp_path / "rec"
        indir.mkdir()
        files = {
            "a": (rng.integers(-300, 300, size=(5000, 1),
                               dtype=np.int16).astype(np.int32), 44100, 16),
            "b": (rng.integers(-100, 100, size=(12345, 2),
                               dtype=np.int16).astype(np.int32), 16000, 16),
            "c": (rng.integers(-40000, 40000, size=(3000, 1)
                               ).astype(np.int32), 48000, 24),
        }
        for name, (x, rate, bits) in files.items():
            wav.write_wav_int(str(indir / f"{name}.wav"), x, rate, bits)
        assert cli.main(["corpus", str(indir), str(outdir),
                         "--lossless"]) == 0
        assert cli.main(["corpus-decode", str(outdir), str(recdir)]) == 0
        for name, (x, rate, bits) in files.items():
            y, r2, b2 = wav.read_wav_int(str(recdir / f"{name}.wav"))
            assert (r2, b2) == (rate, bits)
            np.testing.assert_array_equal(x, y)

    def test_corpus_lossless_refuses_lossy_flags(self, tmp_path, capsys):
        import audiocodec_tpu.__main__ as cli

        indir = tmp_path / "in"
        indir.mkdir()
        wav.write_wav_int(str(indir / "a.wav"),
                          np.zeros((4096, 1), np.int32), 44100, 16)
        rc = cli.main(["corpus", str(indir), str(tmp_path / "o"),
                       "--lossless", "--sample-rate", "44100"])
        assert rc != 0
        assert "rate is preserved" in capsys.readouterr().err
        rc = cli.main(["corpus", str(indir), str(tmp_path / "o")])
        assert rc != 0  # lossy corpus still requires --sample-rate

    def test_float_input_refused(self, tmp_path, capsys):
        import audiocodec_tpu.__main__ as cli

        src = str(tmp_path / "f.wav")
        wav.write_wav(src, np.zeros((4096, 1)), 44100, width=4)
        rc = cli.main(["encode", src, str(tmp_path / "o.acz"), "--lossless"])
        assert rc != 0


class TestLPCLevel:
    """Level-2 tier: per-frame ORDER-SEARCHED quantized LPC (container
    version 3; legacy version-2 streams must keep decoding). The
    contract is unchanged — decode(encode(x)) == x bit-for-bit — plus
    the tier must actually earn its bytes on predictable content and
    its container members must be hardened like the others."""

    def _music(self, secs=6, sr=44100):
        rng = np.random.default_rng(21)
        t = np.arange(sr * secs) / sr
        l = (9000 * np.sin(2 * np.pi * 330 * t)
             + 4000 * np.sin(2 * np.pi * 495 * t + 0.3)
             + rng.normal(0, 80, t.size)).astype(np.int32)
        r = (0.8 * l + rng.normal(0, 60, t.size)).astype(np.int32)
        return np.stack([l, r], axis=1), sr

    def test_level2_bit_exact_and_smaller(self):
        x, sr = self._music()
        b1 = lossless.encode_lossless(x, sr, level=1)
        b2 = lossless.encode_lossless(x, sr, level=2)
        y, rate, bits = lossless.decode_lossless(b2)
        np.testing.assert_array_equal(y, x)
        assert lossless.describe(b2)["version"] == 3
        # tonal-dominated content: LPC must beat the fixed ladder
        assert len(b2) < len(b1)

    def test_level2_order_search_varies(self):
        """The v3 tier searches per-frame orders: tonal+noise music must
        produce orders beyond the old fixed 8, and the sparse members
        must be structurally consistent."""
        import zipfile

        x, sr = self._music()
        b2 = lossless.encode_lossless(x, sr, level=2)
        src = zipfile.ZipFile(io.BytesIO(b2))
        lpco = np.load(io.BytesIO(src.read("lpco.npy")))
        lpcc = np.load(io.BytesIO(src.read("lpcc.npy")))
        orders = np.load(io.BytesIO(src.read("orders.npy")))
        assert lpco.shape == (int((orders == lossless.LPC_MARK).sum()), 2)
        assert lpcc.size == int(lpco[:, 0].sum())
        assert lpco[:, 0].max() > 8  # the search actually went past 8
        assert lpco[:, 0].max() <= lossless.LPC_MAX_ORDER

    def test_v2_golden_container_still_decodes(self):
        """Frozen version-2 (dense fixed-order-8) container from the
        round-4 encoder: decode compatibility is pinned forever."""
        import os

        vec = os.path.join(os.path.dirname(__file__), "vectors")
        blob = open(os.path.join(vec, "lossless_v2.bin"), "rb").read()
        ref = np.load(os.path.join(vec, "lossless_v2.pcm.npy"))
        assert lossless.describe(blob)["version"] == 2
        y, rate, bits = lossless.decode_lossless(blob)
        np.testing.assert_array_equal(y, ref)

    def test_level2_mono_24bit_odd_length(self):
        rng = np.random.default_rng(22)
        n = 3 * 4096 + 777
        t = np.arange(n) / 48000
        x = (4_000_000 * np.sin(2 * np.pi * 123 * t)
             + rng.normal(0, 500, n)).astype(np.int32)[:, None]
        blob = lossless.encode_lossless(x, 48000, bits=24, level=2)
        y, _, _ = lossless.decode_lossless(blob)
        np.testing.assert_array_equal(y, x)

    def test_level2_noise_still_never_expands(self):
        rng = np.random.default_rng(23)
        x = rng.integers(-32768, 32767, size=(30000, 2), dtype=np.int16)
        blob = lossless.encode_lossless(x, 44100, level=2)
        y, _, _ = lossless.decode_lossless(blob)
        np.testing.assert_array_equal(np.asarray(x, np.int32), y)
        assert len(blob) < 1.01 * x.size * 2

    def test_level1_streams_stay_version1(self):
        x, sr = self._music(secs=2)
        blob = lossless.encode_lossless(x, sr, level=1)
        assert lossless.describe(blob)["version"] == 1

    def test_bad_level_rejected(self):
        with pytest.raises(ValueError, match="level"):
            lossless.encode_lossless(
                np.zeros((1000, 1), np.int16), 44100, level=3
            )

    def _retag(self, blob, member, drop=False, shape=None, vals=None,
               edit=None):
        """Rewrite one member of a container (attacker model)."""
        src = zipfile.ZipFile(io.BytesIO(blob))
        out = io.BytesIO()
        with zipfile.ZipFile(out, "w") as dst:
            for name in src.namelist():
                data = src.read(name)
                if name == member + ".npy":
                    if drop:
                        continue
                    arr = np.load(io.BytesIO(data))
                    if edit is not None:
                        arr = edit(arr)
                    if vals is not None:
                        arr = vals
                    if shape is not None:
                        arr = np.zeros(shape, arr.dtype)
                    nb = io.BytesIO()
                    np.save(nb, arr)
                    data = nb.getvalue()
                dst.writestr(name, data)
        return out.getvalue()

    def test_missing_lpc_members_rejected(self):
        x, sr = self._music(secs=2)
        blob = lossless.encode_lossless(x, sr, level=2)
        assert lossless.describe(blob)["version"] == 3
        for member in ("lpco", "lpcc"):
            with pytest.raises(ValueError, match="missing member|corrupt"):
                lossless.decode_lossless(
                    self._retag(blob, member, drop=True)
                )

    def test_wrong_lpco_shape_rejected(self):
        x, sr = self._music(secs=2)
        blob = lossless.encode_lossless(x, sr, level=2)
        with pytest.raises(ValueError, match="lpco|lpc"):
            lossless.decode_lossless(
                self._retag(blob, "lpco", shape=(1, 2))
            )

    def test_lpcc_size_mismatch_rejected(self):
        x, sr = self._music(secs=2)
        blob = lossless.encode_lossless(x, sr, level=2)
        with pytest.raises(ValueError, match="lpcc"):
            lossless.decode_lossless(
                self._retag(blob, "lpcc", edit=lambda a: a[:-3])
            )

    def test_order_shift_out_of_range_rejected(self):
        x, sr = self._music(secs=2)
        blob = lossless.encode_lossless(x, sr, level=2)
        for col, bad in ((0, 0), (0, 60), (1, 40)):
            def evil(a, col=col, bad=bad):
                a = a.astype(np.int32).copy()
                a[0, col] = bad
                return a
            with pytest.raises(ValueError, match="order|shift|lpc"):
                lossless.decode_lossless(
                    self._retag(blob, "lpco", edit=evil)
                )

    def test_tampered_lpc_values_never_crash(self):
        """Garbage coefficients must yield ValueError or wrong samples,
        never a crash/overflow (the int64 accumulator + bit-depth bounds
        check)."""
        x, sr = self._music(secs=2)
        blob = lossless.encode_lossless(x, sr, level=2)
        src = zipfile.ZipFile(io.BytesIO(blob))
        lpcc = np.load(io.BytesIO(src.read("lpcc.npy")))
        evil = np.full_like(lpcc, 32767)
        try:
            lossless.decode_lossless(
                self._retag(blob, "lpcc", vals=evil)
            )
        except ValueError:
            pass  # bit-depth bounds / CRC check fired — fine

    def test_tampered_v2_members_rejected(self):
        """The frozen v2 vector's dense member keeps its hardening."""
        import os

        vec = os.path.join(os.path.dirname(__file__), "vectors")
        blob = open(os.path.join(vec, "lossless_v2.bin"), "rb").read()
        with pytest.raises(ValueError, match="missing member|corrupt"):
            lossless.decode_lossless(self._retag(blob, "lpc", drop=True))
        with pytest.raises(ValueError, match="lpc"):
            lossless.decode_lossless(
                self._retag(blob, "lpc", shape=(1, lossless.LPC_ORDER, 2))
            )

    def test_level2_multichannel(self):
        rng = np.random.default_rng(24)
        t = np.arange(30000) / 44100
        x = np.stack(
            [(6000 * np.sin(2 * np.pi * (200 + 50 * c) * t)
              + rng.normal(0, 40, t.size)).astype(np.int32)
             for c in range(6)], axis=1,
        )
        blob = lossless.encode_lossless(x, 44100, level=2)
        y, _, _ = lossless.decode_lossless(blob)
        np.testing.assert_array_equal(y, x)

    def test_level2_tiny_clip_small_frame(self):
        rng = np.random.default_rng(25)
        x = rng.integers(-200, 200, size=(300, 1), dtype=np.int16)
        blob = lossless.encode_lossless(x, 44100, level=2, frame=256)
        y, _, _ = lossless.decode_lossless(blob)
        np.testing.assert_array_equal(y, np.asarray(x, np.int32))

    def test_cli_level2_roundtrip(self, tmp_path):
        import subprocess
        import sys

        from audiocodec_tpu.io import wav as _wav

        x, sr = self._music(secs=1)
        src = str(tmp_path / "in.wav")
        acz = str(tmp_path / "out.acz")
        back = str(tmp_path / "back.wav")
        _wav.write_wav_int(src, x, sr, 16)
        for cmd in (
            ["encode", src, acz, "--lossless", "--lossless-level", "2"],
            ["decode", acz, back],
        ):
            r = subprocess.run(
                [sys.executable, "-m", "audiocodec_tpu"] + cmd,
                capture_output=True, text=True,
            )
            assert r.returncode == 0, r.stderr
        y, rate, bits = _wav.read_wav_int(back)
        np.testing.assert_array_equal(y, x)


class TestRandomAccess:
    """decode_lossless(start, count): bit-exact vs the slice of a full
    decode, across every entropy family, with the fidx index hardened
    like every other member and a prefix-decode fallback for streams
    written before the index existed."""

    def _cases(self):
        rng = np.random.default_rng(31)
        sr = 44100
        t = np.arange(sr * 4) / sr
        l = (9000 * np.sin(2 * np.pi * 440 * t)
             + rng.normal(0, 90, t.size)).astype(np.int32)
        music = np.stack(
            [l, (0.8 * l + rng.normal(0, 70, t.size)).astype(np.int32)],
            axis=1,
        )
        sil = music.copy()
        sil[: sr * 2] = 0
        sine = (20000 * np.sin(2 * np.pi * 440 * np.arange(sr * 2) / sr)
                ).astype(np.int32)[:, None]
        noise = rng.integers(-32768, 32767, size=(sr, 2)).astype(np.int32)
        return sr, [
            ("rice", music, 1), ("lpc", music, 2), ("rrice", sil, 1),
            ("tonal", sine, 1), ("verbatim", noise, 1),
        ]

    def test_ranges_exact_all_modes(self):
        sr, cases = self._cases()
        for name, x, level in cases:
            blob = lossless.encode_lossless(x, sr, level=level)
            assert lossless.describe(blob)["seekable"]
            n = x.shape[0]
            for s, c in [(0, 999), (4096 * 2, 4096), (n // 2 + 7, 9999),
                         (n - 77, None), (123, 1)]:
                c_eff = n - s if c is None else min(c, n - s)
                y, rate, bits = lossless.decode_lossless(
                    blob, start=s, count=c
                )
                np.testing.assert_array_equal(
                    y, x[s:s + c_eff], err_msg=f"{name} ({s}, {c})"
                )

    def test_prefix_fallback_without_fidx(self):
        """Streams without the index (pre-round-5) range-decode via the
        prefix path — still bit-exact."""
        sr, cases = self._cases()
        _, x, _ = cases[0][0], cases[0][1], cases[0][2]
        blob = lossless.encode_lossless(x, sr)
        src = zipfile.ZipFile(io.BytesIO(blob))
        out = io.BytesIO()
        with zipfile.ZipFile(out, "w") as dst:
            for nm in src.namelist():
                if nm != "fidx.npy":
                    dst.writestr(nm, src.read(nm))
        old = out.getvalue()
        assert not lossless.describe(old)["seekable"]
        y, _, _ = lossless.decode_lossless(old, start=44100, count=4096)
        np.testing.assert_array_equal(y, x[44100:44100 + 4096])

    def test_v2_golden_partial_decode(self):
        import os

        vec = os.path.join(os.path.dirname(__file__), "vectors")
        blob = open(os.path.join(vec, "lossless_v2.bin"), "rb").read()
        ref = np.load(os.path.join(vec, "lossless_v2.pcm.npy"))
        y, _, _ = lossless.decode_lossless(blob, start=10000, count=5000)
        np.testing.assert_array_equal(y, ref[10000:15000])

    def _retag_fidx(self, blob, edit):
        src = zipfile.ZipFile(io.BytesIO(blob))
        out = io.BytesIO()
        with zipfile.ZipFile(out, "w") as dst:
            for nm in src.namelist():
                data = src.read(nm)
                if nm == "fidx.npy":
                    arr = edit(np.load(io.BytesIO(data)))
                    nb = io.BytesIO()
                    np.save(nb, arr)
                    data = nb.getvalue()
                dst.writestr(nm, data)
        return out.getvalue()

    def test_corrupt_fidx_rejected(self):
        sr, cases = self._cases()
        x = cases[0][1]
        blob = lossless.encode_lossless(x, sr)
        for label, edit in [
            ("wrong shape", lambda a: a[:-1]),
            ("non-monotonic", lambda a: a[::-1].copy()),
            ("negative", lambda a: (a.astype(np.int64) - 10**6)),
            ("float dtype", lambda a: a.astype(np.float64)),
        ]:
            bad = self._retag_fidx(blob, edit)
            with pytest.raises(ValueError, match="fidx|corrupt"):
                lossless.decode_lossless(bad, start=8192, count=100)

    def test_fidx_beyond_stream_rejected_or_garbage_bounded(self):
        """Offsets past the payload must raise, never read OOB."""
        sr, cases = self._cases()
        x = cases[0][1]
        blob = lossless.encode_lossless(x, sr)
        bad = self._retag_fidx(
            blob, lambda a: a + np.uint64(10**9)
        )
        with pytest.raises(ValueError):
            lossless.decode_lossless(bad, start=8192, count=100)

    def test_bounds_errors(self):
        sr, cases = self._cases()
        x = cases[0][1]
        blob = lossless.encode_lossless(x, sr)
        for s, c in [(-1, None), (x.shape[0], None), (10**15, None),
                     (0, 0), (0, -4)]:
            with pytest.raises(ValueError):
                lossless.decode_lossless(blob, start=s, count=c)
        # count overruns clamp instead of raising
        y, _, _ = lossless.decode_lossless(
            blob, start=x.shape[0] - 10, count=10**9
        )
        np.testing.assert_array_equal(y, x[-10:])

    def test_cli_start_duration(self, tmp_path):
        import subprocess
        import sys

        from audiocodec_tpu.io import wav as _wav

        sr, cases = self._cases()
        x = cases[0][1]
        src = str(tmp_path / "in.wav")
        acz = str(tmp_path / "a.acz")
        back = str(tmp_path / "b.wav")
        _wav.write_wav_int(src, x, sr, 16)
        for cmd in (
            ["encode", src, acz, "--lossless"],
            ["decode", acz, back, "--start", "1.0", "--duration", "0.5"],
        ):
            r = subprocess.run(
                [sys.executable, "-m", "audiocodec_tpu"] + cmd,
                capture_output=True, text=True,
            )
            assert r.returncode == 0, r.stderr
        y, rate, bits = _wav.read_wav_int(back)
        np.testing.assert_array_equal(y, x[sr:sr + sr // 2])


class TestIntegrityCRC:
    """FLAC-MD5-style whole-stream integrity: every new container
    carries a CRC32 of the source PCM; decode verifies it, catching bit
    rot and coder regressions the structural checks cannot."""

    def _blob(self):
        rng = np.random.default_rng(31)
        x = (np.cumsum(rng.normal(0, 200, (20000, 2)), axis=0)
             ).astype(np.int32)
        np.clip(x, -30000, 30000, out=x)
        return x, lossless.encode_lossless(x, 44100)

    def test_describe_reports_crc(self):
        _, blob = self._blob()
        assert lossless.describe(blob)["integrity"] == "crc32"

    def test_flipped_residual_byte_detected(self):
        x, blob = self._blob()
        src = zipfile.ZipFile(io.BytesIO(blob))
        out = io.BytesIO()
        with zipfile.ZipFile(out, "w") as dst:
            for name in src.namelist():
                data = src.read(name)
                if name == "res.npy":
                    b = bytearray(data)
                    b[-200] ^= 0x10  # flip a residual payload bit
                    data = bytes(b)
                dst.writestr(name, data)
        # either the entropy layer rejects the stream outright, or the
        # reconstruction differs and the CRC catches it
        with pytest.raises(ValueError):
            lossless.decode_lossless(out.getvalue())

    def test_pre_crc_containers_still_decode(self):
        x, blob = self._blob()
        src = zipfile.ZipFile(io.BytesIO(blob))
        out = io.BytesIO()
        with zipfile.ZipFile(out, "w") as dst:
            for name in src.namelist():
                if name == "pcrc.npy":
                    continue  # a round-3 writer never stored it
                dst.writestr(name, src.read(name))
        y, _, _ = lossless.decode_lossless(out.getvalue())
        np.testing.assert_array_equal(y, x)


class TestV3GoldenVector:
    """Frozen version-3 container (round-5 encoder: order-searched
    sparse LPC + fidx index): decode compatibility is pinned forever,
    including the range-decode path through the frozen index."""

    def _load(self):
        import os

        vec = os.path.join(os.path.dirname(__file__), "vectors")
        blob = open(os.path.join(vec, "lossless_v3.bin"), "rb").read()
        ref = np.load(os.path.join(vec, "lossless_v3.pcm.npy"))
        return blob, ref

    def test_full_decode(self):
        blob, ref = self._load()
        d = lossless.describe(blob)
        assert d["version"] == 3 and d["seekable"]
        y, rate, bits = lossless.decode_lossless(blob)
        assert (rate, bits) == (44100, 16)
        np.testing.assert_array_equal(y, ref)

    def test_range_decode_through_frozen_index(self):
        blob, ref = self._load()
        for s, c in [(0, 4096), (12345, 6789), (ref.shape[0] - 500, None)]:
            y, _, _ = lossless.decode_lossless(blob, start=s, count=c)
            end = ref.shape[0] if c is None else min(s + c, ref.shape[0])
            np.testing.assert_array_equal(y, ref[s:end])
