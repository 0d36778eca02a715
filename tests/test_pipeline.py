"""Prefetching ingest pipeline tests (real WAV files on disk)."""

import numpy as np
import pytest

from audiocodec_tpu import native
from audiocodec_tpu.codec import Codec
from audiocodec_tpu.io.wav import write_wav
from audiocodec_tpu.parallel import mesh as _mesh
from audiocodec_tpu.parallel.pipeline import (
    PrefetchingCorpusLoader,
    encode_corpus_streaming,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    paths, clips = [], []
    for i in range(10):
        x = rng.uniform(-0.8, 0.8, size=(4 * 64, 1)).astype(np.float32)
        p = str(root / f"clip{i}.wav")
        write_wav(p, x, 16000)
        paths.append(p)
        clips.append(x)
    return paths, clips


class TestPrefetchingLoader:
    def test_yields_all_batches_in_order(self, corpus):
        paths, clips = corpus
        loader = PrefetchingCorpusLoader(
            paths, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            batch_size=4, prefetch=2,
        )
        assert len(loader) == 3
        seen = 0
        for batch, status in loader:
            assert (status == 0).all()
            for row in range(batch.shape[0]):
                np.testing.assert_allclose(
                    np.asarray(batch[row]), clips[seen + row],
                    atol=2.0 / 32768,
                )
            seen += batch.shape[0]
        assert seen == 10

    def test_error_propagates_to_consumer(self, corpus):
        paths, _ = corpus
        loader = PrefetchingCorpusLoader(
            ["/nonexistent/x.wav"] + paths,
            clip_seconds=0.01, sample_rate=16000, batch_size=4,
        )
        # missing files are reported via status, not exceptions
        batches = list(loader)
        assert batches[0][1][0] == -1

    def test_streaming_encode_end_to_end(self, corpus):
        paths, _ = corpus
        codec = Codec.create(16000, filters_n=64, bark_bands_n=16)
        mesh = _mesh.make_mesh(n_devices=2)
        out = encode_corpus_streaming(
            codec, paths, mesh=mesh,
            clip_seconds=4 * 64 / 16000, sample_rate=16000, batch_size=4,
        )
        assert len(out) == 3
        total = sum(c.shape[0] for c, _, _ in out)
        assert total == 10  # padding stripped
        codes, delta, status = out[0]
        assert codes.shape == (4, 5, 64, 1)
        assert (np.asarray(status) == 0).all()


class TestLoaderLifecycle:
    def test_reiteration_is_clean(self, corpus):
        """A second iteration must replay all batches exactly — no stale
        items from a previous (even abandoned) pass."""
        paths, _ = corpus
        loader = PrefetchingCorpusLoader(
            paths, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            batch_size=4, prefetch=1,
        )
        it = iter(loader)
        next(it)  # consume one batch, then abandon
        it.close()
        counts = [sum(b.shape[0] for b, _ in loader) for _ in range(2)]
        assert counts == [10, 10]


class TestInt16Wire:
    """wire_dtype="int16" halves H2D bytes; PCM16-sourced corpora decode
    bit-exactly after the on-device rescale."""

    def test_loader_yields_int16(self, corpus):
        paths, _ = corpus
        loader = PrefetchingCorpusLoader(
            paths, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            batch_size=4, wire_dtype="int16",
        )
        batch, status = next(iter(loader))
        assert batch.dtype == np.int16
        assert (np.asarray(status) == 0).all()

    def test_invalid_wire_dtype(self, corpus):
        paths, _ = corpus
        with pytest.raises(ValueError, match="wire_dtype"):
            PrefetchingCorpusLoader(
                paths, clip_seconds=1.0, sample_rate=16000,
                wire_dtype="int8",
            )

    def test_streaming_encode_matches_float_wire(self, corpus):
        """For PCM16 sources the int16 wire must produce IDENTICAL codes
        to the float32 wire (the WAVs on disk are 16-bit, so the float
        pipeline's values are pcm/32768 exactly)."""
        paths, _ = corpus
        codec = Codec.create(16000, filters_n=64, bark_bands_n=16)
        mesh = _mesh.make_mesh(n_devices=2)
        kwargs = dict(
            mesh=mesh, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            batch_size=4,
        )
        ref = encode_corpus_streaming(codec, paths, **kwargs)
        i16 = encode_corpus_streaming(
            codec, paths, wire_dtype="int16", **kwargs
        )
        assert len(ref) == len(i16)
        for (c0, d0, _), (c1, d1, _) in zip(ref, i16):
            np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
            np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


class TestCorpusCache:
    """build_corpus_cache + CachedCorpusLoader: the repeat-epoch path —
    one native decode ever, then memmapped PCM batches."""

    def test_cache_roundtrip_and_encode_parity(self, corpus, tmp_path):
        from audiocodec_tpu.parallel.pipeline import (
            CachedCorpusLoader,
            build_corpus_cache,
        )

        paths, _ = corpus
        cache = str(tmp_path / "corpus_cache.npy")
        status = build_corpus_cache(
            paths, cache, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            batch_size=4,
        )
        assert (status == 0).all()

        # cached batches == live int16-wire batches, bit for bit
        live = PrefetchingCorpusLoader(
            paths, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            batch_size=4, wire_dtype="int16",
        )
        cached = CachedCorpusLoader(cache, batch_size=4)
        assert len(cached) == len(live)
        for (lb, ls), (cb, cs) in zip(live, cached):
            np.testing.assert_array_equal(np.asarray(lb), np.asarray(cb))
            np.testing.assert_array_equal(np.asarray(ls), np.asarray(cs))

        # end-to-end: encode through the cache == encode from WAVs
        codec = Codec.create(16000, filters_n=64, bark_bands_n=16)
        mesh = _mesh.make_mesh(n_devices=2)
        kwargs = dict(mesh=mesh, batch_size=4)
        ref = encode_corpus_streaming(
            codec, paths, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            wire_dtype="int16", **kwargs,
        )
        got = encode_corpus_streaming(
            codec, paths, cache_path=cache, **kwargs
        )
        for (c0, d0, _), (c1, d1, _) in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
            np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
