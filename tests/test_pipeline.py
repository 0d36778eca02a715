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
            codec, paths, cache_path=cache, clip_seconds=4 * 64 / 16000,
            sample_rate=16000, **kwargs,
        )
        for (c0, d0, _), (c1, d1, _) in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
            np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


class TestPadBatches:
    def test_prefetching_loader_pads_final_batch(self, corpus):
        from audiocodec_tpu.parallel.pipeline import PAD_STATUS

        paths, _ = corpus  # 10 clips, batch 4 -> final batch is 2 real
        loader = PrefetchingCorpusLoader(
            paths, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            batch_size=4, wire_dtype="int16", pad_batches=True,
        )
        batches = list(loader)
        assert all(b.shape[0] == 4 for b, _ in batches)
        last_b, last_s = batches[-1]
        assert list(last_s) == [0, 0, PAD_STATUS, PAD_STATUS]
        assert not np.asarray(last_b)[2:].any()  # pad rows are zeros

    def test_cached_loader_pads_final_batch(self, corpus, tmp_path):
        from audiocodec_tpu.parallel.pipeline import (
            PAD_STATUS,
            CachedCorpusLoader,
            build_corpus_cache,
        )

        paths, _ = corpus
        cache = str(tmp_path / "pad_cache.npy")
        build_corpus_cache(
            paths, cache, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            batch_size=4,
        )
        loader = CachedCorpusLoader(cache, batch_size=4, pad_batches=True)
        batches = list(loader)
        assert all(b.shape[0] == 4 for b, _ in batches)
        assert list(batches[-1][1]) == [0, 0, PAD_STATUS, PAD_STATUS]


class TestEndOfStreamSentinel:
    def test_sentinel_survives_full_queue(self):
        """The producer's end-of-stream sentinel must wait for queue
        space instead of dropping after a fixed timeout (a consumer
        sitting in a long cold compile would then hang forever)."""
        import queue as _queue
        import threading
        import time

        from audiocodec_tpu.parallel.pipeline import _put_sentinel

        q = _queue.Queue(maxsize=1)
        q.put("batch")  # queue full
        stop = threading.Event()
        t = threading.Thread(target=_put_sentinel, args=(q, stop))
        t.start()
        time.sleep(0.6)  # longer than the put timeout slice
        assert q.get() == "batch"
        assert q.get(timeout=5.0) is None  # sentinel arrived after space
        t.join(timeout=5.0)
        assert not t.is_alive()

    def test_sentinel_put_abandons_on_stop(self):
        import queue as _queue
        import threading

        from audiocodec_tpu.parallel.pipeline import _put_sentinel

        q = _queue.Queue(maxsize=1)
        q.put("batch")
        stop = threading.Event()
        t = threading.Thread(target=_put_sentinel, args=(q, stop))
        t.start()
        stop.set()  # consumer walked away
        t.join(timeout=5.0)
        assert not t.is_alive()
        assert q.get() == "batch"
        assert q.empty()  # no sentinel forced into an abandoned queue

    def test_slow_consumer_still_terminates(self, corpus):
        import time

        paths, _ = corpus
        loader = PrefetchingCorpusLoader(
            paths, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            batch_size=4, prefetch=1,
        )
        seen = 0
        for _batch, _status in loader:
            time.sleep(0.4)  # stall with the queue full
            seen += 1
        assert seen == 3


class TestCacheRobustness:
    def test_missing_meta_sidecar_raises_value_error(self, corpus, tmp_path):
        """An interrupted build leaves the .npy without its sidecar; both
        the validator and the loader must raise the documented ValueError
        with rebuild advice, not a raw FileNotFoundError."""
        import os

        from audiocodec_tpu.parallel.pipeline import (
            CachedCorpusLoader,
            build_corpus_cache,
            validate_corpus_cache,
        )

        paths, _ = corpus
        cache = str(tmp_path / "broken.npy")
        build_corpus_cache(
            paths, cache, clip_seconds=4 * 64 / 16000, sample_rate=16000,
        )
        os.unlink(cache + ".meta.npz")
        with pytest.raises(ValueError, match="interrupted"):
            validate_corpus_cache(
                cache, paths, clip_seconds=4 * 64 / 16000, sample_rate=16000,
            )
        with pytest.raises(ValueError, match="interrupted"):
            CachedCorpusLoader(cache)

    def test_streaming_encode_requires_framing_with_cache(
        self, corpus, tmp_path
    ):
        """cache_path without clip_seconds/sample_rate must refuse: the
        positional cache cannot be validated against the corpus, and a
        silent mispairing would encode the wrong audio under a name."""
        from audiocodec_tpu.parallel.pipeline import build_corpus_cache

        paths, _ = corpus
        cache = str(tmp_path / "framed.npy")
        build_corpus_cache(
            paths, cache, clip_seconds=4 * 64 / 16000, sample_rate=16000,
        )
        codec = Codec.create(16000, filters_n=64, bark_bands_n=16)
        with pytest.raises(ValueError, match="clip_seconds"):
            encode_corpus_streaming(
                codec, paths, cache_path=cache, batch_size=4,
                mesh=_mesh.make_mesh(n_devices=1),
            )
