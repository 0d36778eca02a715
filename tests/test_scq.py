"""Sidecar quantization (scq.py): grid table exactness, wire round
trips, legacy compatibility, corrupt-container rejection, stream
chunking, and the quality bound the grid is calibrated to."""

import numpy as np
import jax.numpy as jnp
import pytest

import audiocodec_tpu as act
from audiocodec_tpu import scq
from audiocodec_tpu.io import bitstream
from audiocodec_tpu.io import stream_container as sc

N = 256


@pytest.fixture(scope="module")
def codec():
    return act.Codec.create(44100, filters_n=N, bark_bands_n=32,
                            compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def legacy_codec():
    return act.Codec.create(44100, filters_n=N, bark_bands_n=32,
                            compute_dtype=jnp.float32, sidecar_grid=0)


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(12)
    t = np.arange(N * 24) / 44100
    x = 0.35 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(
        2 * np.pi * 1320 * t
    )
    x += 0.03 * rng.standard_normal(t.size)
    return jnp.asarray(x.astype(np.float32)[None, :, None])


class TestGrid:
    def test_table_strictly_increasing_and_distinct(self):
        for k2 in scq.ALLOWED_K2:
            t = np.asarray(scq.table(k2), np.float64)
            assert (np.diff(t) > 0).all(), f"K2={k2} table not monotone"

    def test_validate_rejects(self):
        for bad in (3, 5, 16, -1, 100):
            with pytest.raises(ValueError):
                scq.validate_k2(bad)

    def test_snap_levels_round_trip_exact(self):
        rng = np.random.default_rng(1)
        bark = jnp.asarray(
            10.0 ** rng.uniform(-14, 1, size=(1, 5, 32, 2)).astype(
                np.float32
            )
        )
        for k2 in scq.ALLOWED_K2:
            snapped = scq.snap(bark, k2)
            assert snapped.dtype == jnp.bfloat16
            lv = scq.levels_from_bark16(np.asarray(snapped), k2)
            rec = scq.bark16_from_levels(lv, k2, lv.shape)
            assert np.array_equal(
                np.asarray(snapped).view(np.uint16), rec.view(np.uint16)
            ), f"K2={k2} reconstruction not bit-identical"

    def test_snap_error_bounded_by_half_step(self):
        rng = np.random.default_rng(2)
        bark = jnp.asarray(
            10.0 ** rng.uniform(-10, 0, size=(1, 4, 32, 1)).astype(
                np.float32
            )
        )
        for k2 in scq.ALLOWED_K2:
            snapped = np.asarray(scq.snap(bark, k2), np.float64)
            ratio_db = np.abs(
                10 * np.log10(snapped / np.asarray(bark, np.float64))
            )
            # half a grid step plus the bf16 table rounding
            step_db = 10 * np.log10(2.0) / k2
            assert ratio_db.max() <= 0.5 * step_db + 0.05

    def test_off_grid_values_rejected(self):
        import ml_dtypes

        vals = np.asarray([0.123], dtype=ml_dtypes.bfloat16)
        with pytest.raises(ValueError, match="grid"):
            scq.levels_from_bark16(vals, 1)

    def test_out_of_bounds_levels_rejected(self):
        lo, hi = scq.level_bounds(4)
        for bad in (lo - 1, hi + 1):
            with pytest.raises(ValueError, match="range"):
                scq.bark16_from_levels(np.asarray([bad]), 4, (1,))

    def test_level_coder_round_trip(self):
        rng = np.random.default_rng(3)
        lv = rng.integers(-150, 20, size=(1, 7, 32, 2)).astype(np.int32)
        data = scq.encode_levels(lv, block_axis=1)
        back = scq.decode_levels(data, lv.shape, block_axis=1)
        assert np.array_equal(lv, back)

    def test_snap_commutes_with_channel_min(self):
        # the ms path takes the min channel; min of table values is a
        # table value, so snap-then-min == min-then-snap
        rng = np.random.default_rng(4)
        bark = jnp.asarray(
            10.0 ** rng.uniform(-8, 0, size=(1, 3, 32, 2)).astype(
                np.float32
            )
        )
        a = jnp.min(scq.snap(bark, 4).astype(jnp.float32), axis=-1)
        b = scq.snap(jnp.min(bark, axis=-1), 4).astype(jnp.float32)
        assert np.array_equal(np.asarray(a), np.asarray(b))


class TestContainer:
    SCALE = 4.0

    def _pack_kw(self, grid=4):
        return dict(
            sample_rate=44100, filters_n=N, bark_bands_n=32, alpha=0.6,
            window_type="vorbis", threshold_scale=self.SCALE,
            sidecar_grid=grid,
        )

    def test_wire_round_trip_bit_identical(self, codec, signal):
        enc = codec.encode_frames(codec.mdct.transform(signal),
                                  threshold_scale=self.SCALE)
        p = bitstream.pack(np.asarray(enc.codes), np.asarray(enc.bark16),
                           **self._pack_kw())
        codes2, bark2, meta = bitstream.unpack(p)
        assert meta["sidecar_grid"] == 4
        assert np.array_equal(np.asarray(enc.codes), codes2)
        assert np.array_equal(
            np.asarray(enc.bark16).view(np.uint16),
            np.asarray(bark2).view(np.uint16),
        )
        y = codec.decode_bitstream(
            jnp.asarray(codes2), jnp.asarray(bark2, jnp.bfloat16),
            threshold_scale=self.SCALE,
        )
        y0 = codec.decode_bitstream(enc.codes, enc.bark16,
                                    threshold_scale=self.SCALE)
        assert np.array_equal(np.asarray(y), np.asarray(y0))

    def test_grid_member_smaller_than_legacy(self, codec, legacy_codec,
                                             signal):
        enc = codec.encode_frames(codec.mdct.transform(signal),
                                  threshold_scale=self.SCALE)
        enc0 = legacy_codec.encode_frames(
            legacy_codec.mdct.transform(signal),
            threshold_scale=self.SCALE,
        )
        p = bitstream.pack(np.asarray(enc.codes), np.asarray(enc.bark16),
                           **self._pack_kw())
        p0 = bitstream.pack(np.asarray(enc0.codes),
                            np.asarray(enc0.bark16),
                            **self._pack_kw(grid=0))
        assert len(p) < len(p0)

    def test_legacy_grid0_matches_old_layout(self, legacy_codec, signal):
        """grid=0 containers carry no scq/bark_lvl members — the exact
        pre-scq layout, decodable by older readers."""
        import io as _io
        import zipfile

        enc = legacy_codec.encode_frames(
            legacy_codec.mdct.transform(signal),
            threshold_scale=self.SCALE,
        )
        p0 = bitstream.pack(np.asarray(enc.codes), np.asarray(enc.bark16),
                            **self._pack_kw(grid=0))
        names = zipfile.ZipFile(_io.BytesIO(p0)).namelist()
        assert "scq.npy" not in names and "bark_lvl.npy" not in names
        # the sidecar must also ride a coder pre-scq readers know —
        # rrice2d postdates them and would make old unpack error out
        assert "bark_rrice2d.npy" not in names
        _, _, meta = bitstream.unpack(p0)
        assert meta["sidecar_grid"] == 0

    def test_ungridded_sidecar_rejected_at_pack(self, legacy_codec,
                                                signal):
        enc = legacy_codec.encode_frames(
            legacy_codec.mdct.transform(signal),
            threshold_scale=self.SCALE,
        )
        with pytest.raises(ValueError, match="grid"):
            bitstream.pack(np.asarray(enc.codes), np.asarray(enc.bark16),
                           **self._pack_kw(grid=4))

    def test_corrupt_scq_rejected(self, codec, signal):
        import io as _io
        import zipfile

        enc = codec.encode_frames(codec.mdct.transform(signal),
                                  threshold_scale=self.SCALE)
        p = bitstream.pack(np.asarray(enc.codes), np.asarray(enc.bark16),
                           **self._pack_kw())
        src = zipfile.ZipFile(_io.BytesIO(p))
        for tamper in ([3], [999], [0]):
            buf = _io.BytesIO()
            with zipfile.ZipFile(buf, "w") as dst:
                for name in src.namelist():
                    data = src.read(name)
                    if name == "scq.npy":
                        arr = _io.BytesIO()
                        np.save(arr, np.asarray(tamper, dtype=np.int64))
                        data = arr.getvalue()
                    dst.writestr(name, data)
            with pytest.raises(ValueError):
                bitstream.unpack(buf.getvalue())

    def test_ms_path(self, codec):
        rng = np.random.default_rng(9)
        t = np.arange(N * 12) / 44100
        mono = (0.4 * np.sin(2 * np.pi * 330 * t)
                + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
        x = jnp.asarray(
            np.stack([mono, 0.9 * mono], axis=-1)[None]
        )
        codes, bark16 = codec.quantize_frames(
            codec.mdct.transform(x), threshold_scale=self.SCALE, ms=True
        )
        assert bark16.shape[-1] == 1
        p = bitstream.pack(np.asarray(codes), np.asarray(bark16),
                           ms=True, **self._pack_kw())
        codes2, bark2, meta = bitstream.unpack(p)
        assert np.array_equal(
            np.asarray(bark16).view(np.uint16),
            np.asarray(bark2).view(np.uint16),
        )


class TestStream:
    SCALE = 4.0

    def test_acs_matches_monolithic_and_seeks(self, codec, signal,
                                              tmp_path):
        path = str(tmp_path / "g.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8,
                         threshold_scale=self.SCALE)
        with sc.StreamReader(path) as r:
            assert r.meta.get("scq") == 4
        streamed = np.concatenate(
            [np.asarray(c) for c in sc.decode_stream(codec, path)],
            axis=1,
        )
        enc = codec.encode_frames(codec.mdct.transform(signal),
                                  threshold_scale=self.SCALE)
        mono = codec.decode_bitstream(enc.codes, enc.bark16,
                                      threshold_scale=self.SCALE)
        np.testing.assert_allclose(streamed, np.asarray(mono), atol=1e-5)
        part = np.concatenate(
            [np.asarray(c)
             for c in sc.decode_stream(codec, path, start_chunk=1)],
            axis=1,
        )
        np.testing.assert_allclose(
            part, streamed[:, streamed.shape[1] - part.shape[1]:],
            atol=1e-6,
        )

    def test_magic_versioning(self, codec, legacy_codec, signal,
                              tmp_path):
        """Grid-quantized streams carry the ACS2 magic (pre-scq readers
        would MIS-decode the level payload as bfloat16 deltas, so they
        must refuse at the magic); grid-0 streams stay ACS1 and carry
        neither scq nor a sidecar coder old readers don't know."""
        import json
        import struct

        p2 = str(tmp_path / "v2.acs")
        sc.encode_stream(codec, signal, p2, chunk_blocks=8,
                         threshold_scale=self.SCALE)
        assert open(p2, "rb").read(4) == b"ACS2"

        p1 = str(tmp_path / "v1.acs")
        sc.encode_stream(legacy_codec, signal, p1, chunk_blocks=8,
                         threshold_scale=self.SCALE)
        raw = open(p1, "rb").read()
        assert raw[:4] == b"ACS1"
        (hlen,) = struct.unpack("<I", raw[4:8])
        header = json.loads(raw[8 : 8 + hlen])
        assert "scq" not in header and "scoder" not in header
        # both versions decode through this reader
        for p in (p1, p2):
            out = np.concatenate(
                [np.asarray(c) for c in sc.decode_stream(
                    legacy_codec if p is p1 else codec, p)], axis=1)
            assert out.shape[1] > 0

    def test_corrupt_header_scq_rejected(self, codec, signal, tmp_path):
        import json
        import struct

        path = str(tmp_path / "h.acs")
        sc.encode_stream(codec, signal, path, chunk_blocks=8,
                         threshold_scale=self.SCALE)
        raw = open(path, "rb").read()
        (hlen,) = struct.unpack("<I", raw[4:8])
        header = json.loads(raw[8 : 8 + hlen])
        for bad in (3, "x", 999):
            meta = dict(header)
            meta["scq"] = bad
            hdr = json.dumps(meta).encode()
            blob = (b"ACS1" + struct.pack("<I", len(hdr)) + hdr
                    + raw[8 + hlen:])
            p2 = str(tmp_path / "h2.acs")
            open(p2, "wb").write(blob)
            with pytest.raises(ValueError):
                sc.StreamReader(p2)


class TestQuality:
    def test_grid_quality_within_noise_of_bf16(self, codec, legacy_codec,
                                               signal):
        """The 0.75 dB grid's threshold wobble must be inaudible-scale:
        quantized round trips with gridded vs bf16 sidecars land within
        a fraction of a dB of each other."""
        from audiocodec_tpu import metrics

        n = codec.mdct.filters_n
        out = {}
        for tag, c in (("grid", codec), ("bf16", legacy_codec)):
            enc = c.encode_frames(c.mdct.transform(signal),
                                  threshold_scale=4.0)
            y = c.decode_bitstream(enc.codes, enc.bark16,
                                   threshold_scale=4.0)[:, n:-n]
            out[tag] = metrics.evaluate(c, signal, y)
        assert abs(out["grid"]["snr_db"] - out["bf16"]["snr_db"]) < 0.5
        assert abs(out["grid"]["nmr"] - out["bf16"]["nmr"]) < 0.05


class TestSerialization:
    def test_config_round_trip(self, codec, tmp_path):
        from audiocodec_tpu.utils import serialization

        path = str(tmp_path / "c.json")
        serialization.save_codec(path, codec)
        back = serialization.load_codec(path)
        assert back.sidecar_grid == codec.sidecar_grid == 4

    def test_old_config_defaults_to_legacy(self, tmp_path):
        import json

        from audiocodec_tpu.utils import serialization

        cfg = serialization.codec_config(
            act.Codec.create(44100, filters_n=N, bark_bands_n=32)
        )
        cfg.pop("sidecar_grid")
        path = str(tmp_path / "old.json")
        with open(path, "w") as f:
            json.dump(cfg, f)
        back = serialization.load_codec(path)
        # pre-scq checkpoints were written by raw-bf16 encoders; the
        # rebuilt codec must keep producing the sidecars its existing
        # bitstreams were derived from
        assert back.sidecar_grid == 0
