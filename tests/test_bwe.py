"""Bandwidth extension (bwe.py): copy-up map, gain analysis, decoder
fill, wire format, noise-fill band capping, stream chunking/seek, and
rate-control integration."""

import numpy as np
import jax.numpy as jnp
import pytest

import audiocodec_tpu as act
from audiocodec_tpu import bwe
from audiocodec_tpu import quantize as q
from audiocodec_tpu.io import bitstream
from audiocodec_tpu.io import stream_container as sc

F32 = jnp.float32
N = 256


@pytest.fixture(scope="module")
def codec():
    return act.Codec.create(
        sample_rate=44100, filters_n=N, bark_bands_n=32,
        compute_dtype=F32,
    )


@pytest.fixture(scope="module")
def signal():
    """Harmonic stack reaching well past the crossover, plus a noise
    floor — the content class replication exists for."""
    rng = np.random.default_rng(7)
    t = np.arange(N * 48) / 44100
    x = sum(0.35 / k * np.sin(2 * np.pi * 330 * k * t)
            for k in range(1, 60))
    x += 0.02 * rng.standard_normal(t.size)
    x = 0.5 * x / np.abs(x).max()
    return jnp.asarray(x.astype(np.float32)[None, :, None])


class TestSourceMap:
    def test_default_start_legal(self):
        for n, sr in ((256, 44100), (1024, 44100), (1024, 16000),
                      (64, 16000), (512, 48000)):
            start = bwe.default_start(n, sr)
            bwe.validate_start(n, start)  # must not raise

    def test_index_is_static_and_aligned(self):
        idx = bwe.source_index(N, 128)
        assert idx.shape == (128,)
        assert idx.min() >= 0 and idx.max() < 128
        # group alignment: each 16-bin target group reads a contiguous
        # source slice (one gain scales one structure)
        for g in range(128 // bwe.GROUP):
            seg = idx[g * bwe.GROUP : (g + 1) * bwe.GROUP]
            assert (np.diff(seg) == 1).all()

    def test_tiling_when_target_wider_than_source(self):
        # start=96 on N=256: width 160 > start 96 -> source tiles
        idx = bwe.source_index(N, 96)
        assert idx.shape == (160,)
        assert idx.min() >= 0 and idx.max() < 96

    def test_validate_rejects(self):
        for bad in (0, 8, 100, N, N - 8):
            with pytest.raises(ValueError):
                bwe.validate_start(N, bad)


class TestAnalyze:
    def _setup(self, start=128, sigma=0.1, step=0.3):
        """Spectrum with known source content and zeroed target bins.
        The step is wide relative to sigma so the zeroed bins sit below
        one step — the regime real quantization produces (a bin only
        codes to zero when |x| < deadzone*delta), where the per-bin
        fill clamp stays slack."""
        rng = np.random.default_rng(3)
        spec = jnp.asarray(
            rng.normal(scale=sigma, size=(1, 4, N, 1)).astype(np.float32)
        )
        delta = jnp.full((1, 4, N, 1), step, F32)
        codes = jnp.asarray(
            np.round(np.asarray(spec) / step).astype(np.int32)
        )
        # zero the whole target range (as an aggressive scale would)
        codes = codes.at[..., start:, :].set(0)
        return spec, codes, delta

    def test_energy_matched_gain(self, ):
        start = 128
        spec, codes, delta = self._setup(start)
        gains = bwe.analyze(spec, codes, delta, start)
        assert gains.shape == (1, 4, (N - start) // bwe.GROUP, 1)
        assert int((gains > 0).sum()) > 0
        # decoder fill restores each group's energy within the uint8
        # log-grid resolution (1.5 dB = up to ~19% per-group amplitude
        # rounding) plus estimator slack
        dq = q.dequantize(codes, delta)
        filled = bwe.fill(dq, codes, delta, gains, start)
        e_want = np.asarray(
            jnp.sum(jnp.square(spec[..., start:, :]), axis=-2)
        )
        e_got = np.asarray(
            jnp.sum(jnp.square(filled[..., start:, :]), axis=-2)
        )
        np.testing.assert_allclose(e_got, e_want, rtol=0.45)

    def test_silence_gives_zero(self):
        z = jnp.zeros((1, 3, N, 1), F32)
        gains = bwe.analyze(z, z.astype(jnp.int32),
                            jnp.full((1, 3, N, 1), 0.1, F32), 128)
        assert int(gains.sum()) == 0

    def test_silent_source_gives_zero(self):
        # energy ONLY in the target band, nothing to copy from
        start = 128
        spec = jnp.zeros((1, 2, N, 1), F32).at[..., start:, :].set(0.2)
        codes = jnp.zeros((1, 2, N, 1), jnp.int32)
        delta = jnp.full((1, 2, N, 1), 1.0, F32)
        gains = bwe.analyze(spec, codes, delta, start)
        assert int(gains.sum()) == 0

    def test_no_holes_gives_zero(self):
        start = 128
        spec, codes, delta = self._setup(start)
        # target codes all nonzero -> nothing zeroed -> no gains
        codes = codes.at[..., start:, :].set(3)
        gains = bwe.analyze(spec, codes, delta, start)
        assert int(gains.sum()) == 0


class TestFill:
    def test_only_zero_codes_above_start_change(self):
        start = 128
        rng = np.random.default_rng(5)
        spec = jnp.asarray(
            rng.normal(size=(1, 3, N, 1)).astype(np.float32)
        )
        codes = jnp.asarray(
            rng.integers(-3, 4, size=(1, 3, N, 1)).astype(np.int32)
        )
        delta = jnp.full((1, 3, N, 1), 0.1, F32)
        gains = jnp.full((1, 3, (N - start) // bwe.GROUP, 1), 140,
                         jnp.uint8)
        out = bwe.fill(spec, codes, delta, gains, start)
        changed = np.asarray(out != spec)
        assert not changed[..., :start, :].any()
        hole = np.asarray(codes[..., start:, :] == 0)
        assert not changed[..., start:, :][~hole].any()

    def test_zero_gain_is_identity(self):
        start = 128
        spec = jnp.ones((1, 2, N, 1), F32)
        codes = jnp.zeros((1, 2, N, 1), jnp.int32)
        delta = jnp.full((1, 2, N, 1), 0.1, F32)
        gains = jnp.zeros((1, 2, (N - start) // bwe.GROUP, 1), jnp.uint8)
        out = bwe.fill(spec, codes, delta, gains, start)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(spec))

    def test_deterministic(self):
        start = 128
        rng = np.random.default_rng(6)
        spec = jnp.asarray(rng.normal(size=(1, 2, N, 1)).astype(np.float32))
        codes = jnp.asarray(
            rng.integers(-2, 3, size=(1, 2, N, 1)).astype(np.int32)
        )
        delta = jnp.full((1, 2, N, 1), 0.1, F32)
        gains = jnp.full((1, 2, (N - start) // bwe.GROUP, 1), 130,
                         jnp.uint8)
        a = bwe.fill(spec, codes, delta, gains, start)
        b = bwe.fill(spec, codes, delta, gains, start)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fill_copies_source_structure(self):
        """The filled bins are scaled copies of the decoded source —
        per-bin proportionality, not just group energy — saturating at
        the target bin's own step size (FILL_CLAMP: a zero-coded bin's
        true magnitude was below ~one step)."""
        start = 128
        rng = np.random.default_rng(8)
        codes = jnp.asarray(
            rng.integers(-5, 6, size=(1, 1, N, 1)).astype(np.int32)
        )
        codes = codes.at[..., start:, :].set(0)
        delta = jnp.full((1, 1, N, 1), 0.1, F32)
        spec = q.dequantize(codes, delta)
        gains = jnp.full((1, 1, (N - start) // bwe.GROUP, 1),
                         int(bwe.LEVEL_BIAS), jnp.uint8)  # gain = 1.0
        out = bwe.fill(spec, codes, delta, gains, start)
        idx = bwe.source_index(N, start)
        cap = bwe.FILL_CLAMP * 0.1
        src = np.clip(np.asarray(spec)[..., idx, :], -cap, cap)
        np.testing.assert_allclose(
            np.asarray(out[..., start:, :]), src, atol=1e-7
        )
        # at least one source bin actually saturates in this setup, so
        # the clamp is exercised, not vacuously equal
        assert (np.abs(np.asarray(spec)[..., idx, :]) > cap).any()


class TestCodecIntegration:
    # coarse enough to zero most high-band bins while the low-band
    # source codes survive (scale 24 zeroes EVERYTHING on the fixture
    # signal — gains would be legitimately all zero)
    SCALE = 8.0

    def test_restores_band_energy(self, codec, signal):
        """End-to-end decode_bitstream honors the gains: the energy at
        ZERO-CODED bins above the crossover — exactly the bins the fill
        owns — comes back within the estimator's tolerance. Measured on
        the re-analysis of the trimmed decode (one block each side), so
        the frame lattice matches the encoder's and MDCT's
        analysis-after-synthesis projection identity makes the
        comparison exact-by-bin rather than smeared."""
        frames = codec.mdct.transform(signal)
        start = codec.bwe_start
        n = codec.mdct.filters_n
        enc = codec.encode_frames(frames, threshold_scale=self.SCALE,
                                  bwe=True)
        assert enc.bwe_gains is not None
        assert int((np.asarray(enc.bwe_gains) > 0).sum()) > 0
        y = codec.decode_bitstream(enc.codes, enc.bark16,
                                   threshold_scale=self.SCALE,
                                   bwe_gains=enc.bwe_gains)
        y0 = codec.decode_bitstream(enc.codes, enc.bark16,
                                    threshold_scale=self.SCALE)
        sp = codec.mdct.transform(y[:, n:-n])
        sp0 = codec.mdct.transform(y0[:, n:-n])
        mask = np.asarray(enc.codes == 0)[..., start:, :]
        want = float((np.asarray(frames)[..., start:, :] ** 2
                      * mask).sum())
        got = float((np.asarray(sp)[..., start:, :] ** 2 * mask).sum())
        got0 = float((np.asarray(sp0)[..., start:, :] ** 2 * mask).sum())
        # without fill the zeroed bins hold only window leakage; with
        # fill they land within ~1 dB of the lost energy
        assert got0 < 0.3 * want
        assert 0.8 * want < got < 1.25 * want

    def test_nf_capped_below_crossover(self, codec, signal):
        """With bwe on, noise-fill levels must ignore holes above the
        crossover: a signal whose holes are ONLY up there yields zero
        nf levels (bwe owns the band)."""
        start = codec.bwe_start
        rng = np.random.default_rng(11)
        # strong low band (codes survive), weak high band (all zeroed)
        t = np.arange(N * 16) / 44100
        x = 0.4 * np.sin(2 * np.pi * 440 * t)
        x += 0.001 * rng.standard_normal(t.size)
        xj = jnp.asarray(x.astype(np.float32)[None, :, None])
        frames = codec.mdct.transform(xj)
        enc = codec.encode_frames(frames, threshold_scale=4.0,
                                  nf=True, bwe=True)
        assert int(np.asarray(enc.nf_levels).sum()) > 0
        # ownership, observed end-to-end: re-analyzed spectra from two
        # different noise seeds must be IDENTICAL above the crossover
        # (structure fill only — seed-independent) and differ below it
        # (that's where the noise got painted). The trimmed re-analysis
        # realigns the frame lattice, so the comparison is per-bin.
        n = codec.mdct.filters_n
        sp = []
        for seed in (3, 4):
            y = codec.decode_bitstream(
                enc.codes, enc.bark16, threshold_scale=4.0,
                nf_levels=enc.nf_levels, nf_seed=seed,
                bwe_gains=enc.bwe_gains,
            )
            assert bool(jnp.isfinite(y).all())
            sp.append(np.asarray(codec.mdct.transform(y[:, n:-n])))
        np.testing.assert_allclose(
            sp[0][..., start:, :], sp[1][..., start:, :], atol=1e-5
        )
        assert np.abs(sp[0][..., :start, :]
                      - sp[1][..., :start, :]).max() > 1e-4

    def test_tns_bwe_combination(self, codec, signal):
        frames = codec.mdct.transform(signal)
        enc = codec.encode_frames(frames, threshold_scale=self.SCALE,
                                  tns=True, nf=True, bwe=True)
        y = codec.decode_bitstream(
            enc.codes, enc.bark16, threshold_scale=self.SCALE,
            tns_idx=enc.tns_idx, nf_levels=enc.nf_levels, nf_seed=0,
            bwe_gains=enc.bwe_gains,
        )
        assert bool(jnp.isfinite(y).all())

    def test_bs_zeroes_short_frame_gains(self, codec):
        rng = np.random.default_rng(13)
        t = np.arange(N * 16) / 44100
        x = (0.1 * rng.standard_normal(t.size)).astype(np.float32)
        x[5 * N + 10 : 5 * N + 30] += 0.8  # transient
        x = np.clip(x, -1, 1)
        xj = jnp.asarray(x[None, :, None])
        frames = codec.mdct.transform(xj)
        enc = codec.encode_frames(frames, threshold_scale=self.SCALE,
                                  bs=True, bwe=True)
        flags = np.asarray(enc.bs_flags)
        assert flags.any(), "transient must fire the detector"
        gains = np.asarray(enc.bwe_gains)
        assert (gains[flags] == 0).all()

    def test_container_round_trip(self, codec, signal):
        frames = codec.mdct.transform(signal)
        enc = codec.encode_frames(frames, threshold_scale=self.SCALE,
                                  bwe=True)
        p = bitstream.pack(
            np.asarray(enc.codes), np.asarray(enc.bark16),
            sample_rate=44100, filters_n=N, bark_bands_n=32, alpha=0.6,
            window_type="vorbis", threshold_scale=self.SCALE,
            bwe_gains=np.asarray(enc.bwe_gains),
            bwe_start=codec.bwe_start,
        )
        codes2, bark2, meta = bitstream.unpack(p)
        assert meta["bwe_start"] == codec.bwe_start
        np.testing.assert_array_equal(
            meta["bwe_gains"], np.asarray(enc.bwe_gains)
        )
        y_direct = codec.decode_bitstream(
            enc.codes, enc.bark16, threshold_scale=self.SCALE,
            bwe_gains=enc.bwe_gains,
        )
        y_wire = codec.decode_bitstream(
            jnp.asarray(codes2), jnp.asarray(bark2, dtype=jnp.bfloat16),
            threshold_scale=meta["threshold_scale"],
            bwe_gains=jnp.asarray(meta["bwe_gains"]),
            bwe_start=meta["bwe_start"],
        )
        np.testing.assert_array_equal(np.asarray(y_direct),
                                      np.asarray(y_wire))

    def test_all_zero_gains_still_recorded(self, codec):
        """bwe-on encodes write the member even when no gain fired —
        its PRESENCE caps the decoder's noise fill at the crossover."""
        z = jnp.zeros((1, N * 4, 1), F32)
        enc = codec.encode_frames(codec.mdct.transform(z), nf=True,
                                  bwe=True)
        assert int(np.asarray(enc.bwe_gains).sum()) == 0
        p = bitstream.pack(
            np.asarray(enc.codes), np.asarray(enc.bark16),
            sample_rate=44100, filters_n=N, bark_bands_n=32, alpha=0.6,
            window_type="vorbis",
            bwe_gains=np.asarray(enc.bwe_gains),
            bwe_start=codec.bwe_start,
        )
        _, _, meta = bitstream.unpack(p)
        assert meta["bwe_gains"] is not None

    def test_bwe_off_containers_unchanged(self, codec, signal):
        frames = codec.mdct.transform(signal)
        codes, bark16 = codec.quantize_frames(frames)
        kw = dict(sample_rate=44100, filters_n=N, bark_bands_n=32,
                  alpha=0.6, window_type="vorbis")
        a = bitstream.pack(np.asarray(codes), np.asarray(bark16), **kw)
        b = bitstream.pack(np.asarray(codes), np.asarray(bark16),
                           bwe_gains=None, bwe_start=0, **kw)
        assert a == b

    def test_corrupt_bwemeta_rejected(self, codec, signal):
        frames = codec.mdct.transform(signal)
        enc = codec.encode_frames(frames, threshold_scale=self.SCALE,
                                  bwe=True)
        good_kw = dict(
            sample_rate=44100, filters_n=N, bark_bands_n=32, alpha=0.6,
            window_type="vorbis",
            bwe_gains=np.asarray(enc.bwe_gains),
        )
        # bad crossover values must be rejected at PACK time
        for bad in (0, 8, N):
            with pytest.raises(ValueError):
                bitstream.pack(np.asarray(enc.codes),
                               np.asarray(enc.bark16),
                               bwe_start=bad, **good_kw)
        # and a tampered container must be rejected at UNPACK time
        import io as _io
        import zipfile

        p = bitstream.pack(np.asarray(enc.codes), np.asarray(enc.bark16),
                           bwe_start=codec.bwe_start, **good_kw)
        src = zipfile.ZipFile(_io.BytesIO(p))
        for tamper in ([9999, bwe.GROUP], [codec.bwe_start, 8]):
            buf = _io.BytesIO()
            with zipfile.ZipFile(buf, "w") as dst:
                # writestr by NAME — handing it src's ZipInfo objects
                # would mutate their header offsets and corrupt src for
                # the next iteration
                for name in src.namelist():
                    data = src.read(name)
                    if name == "bwemeta.npy":
                        arr_buf = _io.BytesIO()
                        np.save(arr_buf,
                                np.asarray(tamper, dtype=np.int64))
                        data = arr_buf.getvalue()
                    dst.writestr(name, data)
            with pytest.raises(ValueError):
                bitstream.unpack(buf.getvalue())


class TestStream:
    # same regime as TestCodecIntegration: real (nonzero) gains must
    # flow through the chunked paths, not a degenerate all-zero member
    SCALE = 8.0

    def test_acs_matches_monolithic(self, codec, signal, tmp_path):
        path = str(tmp_path / "b.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8,
                         threshold_scale=self.SCALE, nf=True, bwe=True)
        streamed = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )
        enc = codec.encode_frames(codec.mdct.transform(signal),
                                  threshold_scale=self.SCALE,
                                  nf=True, bwe=True)
        mono = codec.decode_bitstream(
            enc.codes, enc.bark16, threshold_scale=self.SCALE,
            nf_levels=enc.nf_levels, nf_seed=0,
            bwe_gains=enc.bwe_gains,
        )
        np.testing.assert_allclose(streamed, np.asarray(mono), atol=1e-5)

    def test_seek_agrees(self, codec, signal, tmp_path):
        path = str(tmp_path / "s.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8,
                         threshold_scale=self.SCALE, nf=True, bwe=True)
        full = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )
        part = np.concatenate(
            [np.asarray(c)
             for c in sc.decode_stream(codec, path, start_chunk=2)],
            axis=1,
        )
        np.testing.assert_allclose(
            part, full[:, full.shape[1] - part.shape[1]:], atol=1e-6
        )

    def test_chunk_members_match_monolithic(self, codec, signal,
                                            tmp_path):
        """Per-chunk gains are the monolithic encode's rows (the fill is
        a pure per-frame function — no carried state to drift)."""
        path = str(tmp_path / "c.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8,
                         threshold_scale=self.SCALE, bwe=True)
        enc = codec.encode_frames(codec.mdct.transform(signal),
                                  threshold_scale=self.SCALE, bwe=True)
        g_m = np.asarray(enc.bwe_gains)[0]
        with sc.StreamReader(path) as r:
            assert r.meta["bwe"]["start"] == codec.bwe_start
            off = 0
            for i in range(r.n_chunks):
                c = r.read_chunk(i)
                f = c.codes.shape[0]
                np.testing.assert_array_equal(c.bwe, g_m[off:off + f])
                off += f

    def test_append_contract(self, codec, tmp_path):
        w = sc.StreamWriter(
            str(tmp_path / "x.acs"), sample_rate=44100, filters_n=N,
            bark_bands_n=32, alpha=0.6, window_type="vorbis", channels=1,
            bwe_start=codec.bwe_start,
        )
        codes = np.zeros((4, N, 1), np.int32)
        bark = np.zeros((4, 32, 1), np.uint16)
        import ml_dtypes

        with pytest.raises(ValueError, match="bwe"):
            w.append(codes, bark.view(ml_dtypes.bfloat16))  # missing
        bad = np.zeros((4, 3, 1), np.uint8)  # wrong group count
        with pytest.raises(ValueError, match="shape"):
            w.append(codes, bark.view(ml_dtypes.bfloat16), bwe_gains=bad)

    def test_header_validation(self, codec, tmp_path):
        import json
        import struct

        path = str(tmp_path / "h.acs")
        sc.encode_stream(codec, jnp.zeros((1, N * 8, 1), F32), path,
                         chunk_blocks=8, bwe=True)
        raw = open(path, "rb").read()
        (hlen,) = struct.unpack("<I", raw[4:8])
        header = json.loads(raw[8 : 8 + hlen])

        def rewrite(meta):
            hdr = json.dumps(meta).encode()
            # header length changes; rebuild trailer offsets by reusing
            # StreamReader's own error paths — a bad header must raise
            # before any chunk is touched, so truncating is fine
            blob = (b"ACS1" + struct.pack("<I", len(hdr)) + hdr
                    + raw[8 + hlen:])
            p2 = str(tmp_path / "h2.acs")
            open(p2, "wb").write(blob)
            return p2

        for bad in ({"start": 3, "group": bwe.GROUP},
                    {"start": codec.bwe_start, "group": 8},
                    {"start": "x", "group": bwe.GROUP}):
            meta = dict(header)
            meta["bwe"] = bad
            with pytest.raises(ValueError):
                sc.StreamReader(rewrite(meta))


class TestRateControl:
    def test_rate_control_with_bwe(self, codec):
        from audiocodec_tpu import rate

        # the module fixture is ~0.28 s — container overhead alone puts
        # its floor above 100 kbps, so rate control needs a longer clip
        # for a 40 kbps target to be reachable at all
        rng = np.random.default_rng(17)
        t = np.arange(N * 480) / 44100
        x = sum(0.3 / k * np.sin(2 * np.pi * 330 * k * t)
                for k in range(1, 40))
        x += 0.02 * rng.standard_normal(t.size)
        x = 0.5 * x / np.abs(x).max()
        signal = jnp.asarray(x.astype(np.float32)[None, :, None])
        res = rate.encode_with_target_bitrate(
            codec, signal, 40.0, bwe=True, nf=True,
        )
        assert res.bwe_gains is not None
        assert res.bwe_start == codec.bwe_start
        assert abs(res.kbps - 40.0) < 0.25 * 40.0
        codes, bark, meta = bitstream.unpack(res.packed)
        assert meta["bwe_start"] == codec.bwe_start
        y = codec.decode_bitstream(
            jnp.asarray(codes), jnp.asarray(bark, dtype=jnp.bfloat16),
            threshold_scale=meta["threshold_scale"],
            dz_recon=meta["dz_recon"],
            nf_levels=(None if meta["nf_levels"] is None
                       else jnp.asarray(meta["nf_levels"])),
            nf_band_start=meta["nf_band_start"],
            nf_seed=np.uint32(meta["nf_seed"]),
            bwe_gains=jnp.asarray(meta["bwe_gains"]),
            bwe_start=meta["bwe_start"],
        )
        assert bool(jnp.isfinite(y).all())


class TestDtypes:
    @pytest.mark.parametrize("dtype", [jnp.float64, jnp.bfloat16])
    def test_round_trip_in_dtype(self, dtype):
        codec = act.Codec.create(
            sample_rate=44100, filters_n=N, bark_bands_n=32,
            compute_dtype=dtype,
        )
        rng = np.random.default_rng(2)
        t = np.arange(N * 8) / 44100
        x = sum(0.3 / k * np.sin(2 * np.pi * 440 * k * t)
                for k in range(1, 40))
        xj = jnp.asarray((0.5 * x / np.abs(x).max())[None, :, None],
                         dtype=dtype)
        enc = codec.encode_frames(codec.mdct.transform(xj),
                                  threshold_scale=16.0, bwe=True)
        y = codec.decode_bitstream(enc.codes, enc.bark16,
                                   threshold_scale=16.0,
                                   bwe_gains=enc.bwe_gains)
        assert y.dtype == dtype
        assert bool(jnp.isfinite(y.astype(jnp.float32)).all())
