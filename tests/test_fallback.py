"""No-native-toolchain mode: the whole codec must work (slower) when the
C++ library is unavailable — pure-Python WAV I/O, zlib container."""

import numpy as np
import pytest

import audiocodec_tpu.__main__ as cli
from audiocodec_tpu import native
from audiocodec_tpu.io.wav import read_wav, write_wav


@pytest.fixture()
def no_native(monkeypatch):
    """Simulate a machine without g++/the built library."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_error", "simulated: no toolchain")
    yield
    # monkeypatch auto-restores


class TestFallbackMode:
    def test_available_reports_false(self, no_native):
        assert native.available() is False
        assert "simulated" in native.build_error()

    def test_cli_encode_decode_cycle(self, no_native, tmp_path, capsys):
        rate = 16000
        t = np.arange(rate) / rate
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[:, None]
        wav = str(tmp_path / "in.wav")
        write_wav(wav, x, rate)

        acz = str(tmp_path / "out.acz")
        rec = str(tmp_path / "rec.wav")
        assert cli.main(["encode", wav, acz, "--filters-n", "256"]) == 0
        capsys.readouterr()
        assert cli.main(["decode", acz, rec]) == 0

        y, rrate = read_wav(rec)
        assert rrate == rate
        usable = min(x.shape[0], y.shape[1]) - 256
        a, b = x[:usable, 0], y[0, :usable, 0]
        snr = 10 * np.log10((a**2).sum() / max(((a - b) ** 2).sum(), 1e-30))
        assert snr > 10.0

    def test_fallback_container_is_zlib(self, no_native):
        import io as _io

        import jax.numpy as jnp

        from audiocodec_tpu.io import bitstream

        codes = np.zeros((1, 2, 64, 1), dtype=np.int32)
        bark = jnp.ones((1, 2, 16, 1), dtype=jnp.bfloat16)
        data = bitstream.pack(
            codes, bark, sample_rate=8000, filters_n=64, bark_bands_n=16,
            alpha=0.6, window_type="vorbis",
        )
        with np.load(_io.BytesIO(data)) as z:
            assert "codes" in z.files  # zlib path, not rice
            assert "rice" not in z.files

    def test_native_rice_file_decodes_via_python_fallback(self, tmp_path):
        """Files written WITH the native coder must decode on machines
        WITHOUT it (the pure-Python Rice decoder keeps them portable)."""
        if not native.available():
            pytest.skip("needs the native encoder to produce the file")
        import jax.numpy as jnp

        from audiocodec_tpu.io import bitstream

        rng = np.random.default_rng(0)
        codes = (rng.geometric(0.4, (1, 4, 64, 1)) - 1).astype(np.int32)
        bark = jnp.full((1, 4, 16, 1), 1e-5, dtype=jnp.bfloat16)
        data = bitstream.pack(
            codes, bark, sample_rate=8000, filters_n=64, bark_bands_n=16,
            alpha=0.6, window_type="vorbis", entropy="rice",
        )
        # now decode with the native path disabled
        saved_lib, saved_err = native._lib, native._build_error
        try:
            native._lib, native._build_error = None, "simulated"
            codes2, bark2, _ = bitstream.unpack(data)
        finally:
            native._lib, native._build_error = saved_lib, saved_err
        np.testing.assert_array_equal(codes2, codes)
        np.testing.assert_array_equal(
            np.asarray(bark2).view(np.uint16),
            np.asarray(bark).view(np.uint16),
        )


class TestNaNWireParity:
    def _nan_wav(self, tmp_path):
        # hand-built IEEE-float (format 3) WAV: the only on-disk format
        # that can carry a NaN sample to the decoders
        import struct

        x = np.zeros(64, dtype="<f4")
        x[3] = 0.5
        x[7] = np.nan
        data = x.tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        p = str(tmp_path / "nan.wav")
        with open(p, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
        return p

    def test_fallback_int16_wire_maps_nan_to_zero(self, no_native, tmp_path):
        """The C++ decoder maps NaN float samples to 0 on the int16 wire
        (wavio.cpp decode_samples_i16); the pure-Python fallback must
        match or the same corpus encodes to different bitstreams
        depending on whether the library built."""
        p = self._nan_wav(tmp_path)
        out, status = native.load_corpus(
            [p], clip_seconds=64 / 8000, sample_rate=8000, dtype="int16"
        )
        assert status[0] == 0
        assert out[0, 7, 0] == 0
        assert out[0, 3, 0] == 16384

    def test_native_int16_wire_maps_nan_to_zero(self, tmp_path):
        if not native.available():
            pytest.skip("native library unavailable")
        p = self._nan_wav(tmp_path)
        out, status = native.load_corpus(
            [p], clip_seconds=64 / 8000, sample_rate=8000, dtype="int16"
        )
        assert status[0] == 0
        assert out[0, 7, 0] == 0
        assert out[0, 3, 0] == 16384
