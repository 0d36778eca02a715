"""Prefetching ingest pipeline: overlap host I/O + H2D with device compute.

The corpus benchmark shows the encoder is device-fast but ingest-bound
(benchmarks/run_benchmarks.py config 4): synchronous decode -> device_put ->
encode serializes the host and the chip. This pipeline runs WAV decoding
(the native thread-pool loader) and host->device transfer on a background
thread, keeping a bounded queue of device-resident batches ahead of the
consumer, so the chip never waits on the host in steady state.

    pipe = PrefetchingCorpusLoader(paths, clip_seconds=10.0,
                                   sample_rate=44100, batch_size=64)
    for batch, status in pipe:          # batch is already on device
        codes, delta = encoder(batch)
"""

from __future__ import annotations

import functools
import queue
import threading

import jax
import jax.numpy as jnp

from audiocodec_tpu import native

#: status value marking synthetic zero rows added by ``pad_batches``
PAD_STATUS = -2


def _pad_batch_host(host, status, batch_size):
    """Zero-pad a short batch to ``batch_size`` rows host-side (before
    any sharded device_put) and mark the pad rows' status."""
    import numpy as np

    real = host.shape[0]
    if real >= batch_size:
        return host, status
    host = np.concatenate(
        [host, np.zeros((batch_size - real,) + host.shape[1:], host.dtype)]
    )
    status = np.concatenate(
        [status, np.full(batch_size - real, PAD_STATUS, dtype=np.int32)]
    )
    return host, status


def _put_sentinel(q, stop):
    """Deliver the end-of-stream sentinel with the same bounded-put loop
    as the batches: a fixed-timeout put could hit queue.Full while the
    consumer sits in a long device compile and silently drop the
    sentinel, leaving the consumer blocked in q.get() forever."""
    while not stop.is_set():
        try:
            q.put(None, timeout=0.25)
            return
        except queue.Full:
            continue


@functools.partial(jax.jit, static_argnames="dtype")
def _dequant_wire(b, dtype):
    """int16 wire -> compute-dtype amplitudes, on-device (the point of
    the wire: the link carried half the bytes). Module-level so the
    compiled program is cached across encode_corpus_streaming calls."""
    return (b.astype(jnp.float32) * (1.0 / 32768.0)).astype(dtype)


class PrefetchingCorpusLoader:
    """Iterate device-resident waveform batches decoded ahead of time.

    :param paths: list of WAV paths (equal nominal length; each clip is
        truncated / zero-padded to clip_seconds).
    :param batch_size: clips per yielded batch (last batch may be short).
    :param prefetch: max batches decoded + transferred ahead (>= 1).
    :param sharding: optional jax sharding for device placement (e.g.
        parallel.mesh.waveform_sharding(mesh)); default: default device.
    :param wire_dtype: "float32" (default) or "int16". int16 HALVES the
        host->device bytes — the usual ingest bottleneck — by shipping
        PCM16-scale integers and converting to float on the chip (the
        consumer divides by 32768). For corpora decoded from 16-bit PCM
        (the normal case) the round trip is bit-exact: the decoder's
        float values are pcm/32768, so re-scaling recovers the original
        integers. Float-sourced WAVs lose sub-16-bit detail — keep
        float32 there.
    :param pad_batches: zero-pad a short final batch to ``batch_size``
        on the host BEFORE the sharded device_put (an uneven batch
        cannot be placed under a dp sharding, and a second batch shape
        would force a recompile). Pad rows carry status
        ``PAD_STATUS`` (-2) so consumers skip them.
    :yields: (device array [b, frames, channels], status int32 [b]).
    """

    def __init__(
        self,
        paths,
        clip_seconds: float,
        sample_rate: int,
        channels: int = 1,
        batch_size: int = 64,
        prefetch: int = 2,
        sharding=None,
        decode_threads: int = 0,
        wire_dtype: str = "float32",
        pad_batches: bool = False,
    ):
        if wire_dtype not in ("float32", "int16"):
            raise ValueError(
                f"wire_dtype must be 'float32' or 'int16', got {wire_dtype!r}"
            )
        self._paths = list(paths)
        self._clip_seconds = clip_seconds
        self._sample_rate = sample_rate
        self._channels = channels
        self._batch_size = batch_size
        self._prefetch = max(1, prefetch)
        self._sharding = sharding
        self._decode_threads = decode_threads
        self._wire_dtype = wire_dtype
        self._pad_batches = pad_batches

    def _producer(self, q, stop, errbox):
        try:
            for start in range(0, len(self._paths), self._batch_size):
                chunk = self._paths[start : start + self._batch_size]
                # int16 wire decodes STRAIGHT to PCM16 integers in C++
                # (memcpy for PCM16 sources) — no float round trip, no
                # host-side re-quantization passes
                host, status = native.load_corpus(
                    chunk,
                    clip_seconds=self._clip_seconds,
                    sample_rate=self._sample_rate,
                    channels=self._channels,
                    n_threads=self._decode_threads,
                    dtype=self._wire_dtype,
                )
                if self._pad_batches:
                    host, status = _pad_batch_host(
                        host, status, self._batch_size
                    )
                if self._sharding is not None:
                    dev = jax.device_put(host, self._sharding)
                else:
                    dev = jax.device_put(host)
                # bounded put that notices an abandoned consumer instead of
                # blocking forever holding device memory
                while not stop.is_set():
                    try:
                        q.put((dev, status), timeout=0.25)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # surface on the consumer side
            errbox.append(e)
        finally:
            _put_sentinel(q, stop)

    def __iter__(self):
        # each iteration gets its own queue/thread so re-iteration or an
        # early break can never interleave stale batches
        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()
        errbox: list = []
        thread = threading.Thread(
            target=self._producer, args=(q, stop, errbox), daemon=True
        )
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if errbox:
                        raise errbox[0]
                    return
                yield item
        finally:
            stop.set()

    def __len__(self):
        return -(-len(self._paths) // self._batch_size)


def build_corpus_cache(paths, cache_path: str, *, clip_seconds: float,
                       sample_rate: int, channels: int = 1,
                       batch_size: int = 64, decode_threads: int = 0):
    """Preprocess a WAV corpus into a raw int16 PCM cache for repeat
    epochs: decode once (native, multithreaded, straight to the wire
    format), then every later epoch memmaps page-cached PCM — zero WAV
    parsing, zero conversion, only the H2D transfer remains.

    Writes ``cache_path`` (.npy, [clips, frames, channels] int16) plus a
    ``<cache_path>.meta.npz`` sidecar (per-clip decode status + framing).

    :return: status int32 [n] (0 = ok per clip).
    """
    import numpy as np

    frames = int(clip_seconds * sample_rate)
    n = len(paths)
    arr = np.lib.format.open_memmap(
        cache_path, mode="w+", dtype=np.int16, shape=(n, frames, channels)
    )
    status_all = np.empty(n, dtype=np.int32)
    for start in range(0, n, batch_size):
        chunk = list(paths[start : start + batch_size])
        host, status = native.load_corpus(
            chunk, clip_seconds=clip_seconds, sample_rate=sample_rate,
            channels=channels, n_threads=decode_threads, dtype="int16",
        )
        arr[start : start + len(chunk)] = host
        status_all[start : start + len(chunk)] = status
    arr.flush()
    np.savez(
        cache_path + ".meta.npz",
        status=status_all,
        sample_rate=np.asarray([sample_rate], dtype=np.int64),
        clip_seconds=np.asarray([clip_seconds], dtype=np.float64),
        channels=np.asarray([channels], dtype=np.int64),
        # identity of the corpus the cache was built from — consumers
        # validate against it so a stale cache can never silently pair
        # the wrong audio with a clip (see validate_corpus_cache)
        paths_hash=np.asarray([_paths_digest(paths)]),
    )
    return status_all


def _paths_digest(paths) -> str:
    import hashlib

    h = hashlib.sha256()
    for p in paths:
        h.update(str(p).encode())
        h.update(b"\0")
    return h.hexdigest()


def _load_cache_meta(cache_path: str):
    """The .meta.npz sidecar, or a loud ValueError. A missing sidecar is
    the signature of an interrupted build (open_memmap creates the .npy
    up front; the sidecar is written last) — tell the user to rebuild
    instead of leaking a FileNotFoundError."""
    import numpy as np

    try:
        return np.load(cache_path + ".meta.npz")
    except FileNotFoundError:
        raise ValueError(
            f"PCM cache {cache_path} has no .meta.npz sidecar — the "
            "cache build was interrupted before completion; delete "
            f"{cache_path} and rebuild"
        ) from None


def validate_corpus_cache(cache_path: str, paths, *, clip_seconds: float,
                          sample_rate: int, channels: int = 1) -> None:
    """Raise ValueError unless the cache at ``cache_path`` was built from
    EXACTLY this corpus and framing. A silently-reused stale cache would
    pack one clip's audio under another clip's name (the cache is
    positional) — fail loudly instead and tell the user to rebuild."""
    import numpy as np

    arr = np.load(cache_path, mmap_mode="r")
    meta = _load_cache_meta(cache_path)
    frames = int(clip_seconds * sample_rate)
    problems = []
    if "paths_hash" not in meta.files:
        problems.append("cache predates corpus-identity validation")
    elif str(meta["paths_hash"][0]) != _paths_digest(paths):
        problems.append("file list differs from the one the cache holds")
    if arr.shape[0] != len(paths):
        problems.append(
            f"cache holds {arr.shape[0]} clips, invocation has {len(paths)}"
        )
    if arr.shape[1] != frames:
        problems.append(
            f"cache framing {arr.shape[1]} frames != requested {frames}"
        )
    if arr.shape[2] != channels:
        problems.append(
            f"cache channels {arr.shape[2]} != requested {channels}"
        )
    if "sample_rate" in meta.files and int(meta["sample_rate"][0]) != int(
        sample_rate
    ):
        problems.append(
            f"cache sample_rate {int(meta['sample_rate'][0])} != "
            f"requested {sample_rate}"
        )
    if problems:
        raise ValueError(
            f"PCM cache {cache_path} does not match this corpus/invocation "
            f"({'; '.join(problems)}); delete it (and its .meta.npz) to "
            "rebuild"
        )


class CachedCorpusLoader:
    """Iterate device-resident batches from a prebuilt PCM cache (see
    :func:`build_corpus_cache`) — the repeat-epoch fast path. Same
    iterator contract as :class:`PrefetchingCorpusLoader`: yields
    (device batch, status int32 [b]) with a background prefetch thread
    overlapping page-cache reads + H2D with device compute."""

    def __init__(self, cache_path: str, batch_size: int = 64,
                 prefetch: int = 2, sharding=None,
                 pad_batches: bool = False):
        import numpy as np

        self._arr = np.load(cache_path, mmap_mode="r")
        self._status = _load_cache_meta(cache_path)["status"]
        self._batch_size = batch_size
        self._prefetch = max(1, prefetch)
        self._sharding = sharding
        self._pad_batches = pad_batches

    def _producer(self, q, stop, errbox):
        import numpy as np

        try:
            n = self._arr.shape[0]
            for start in range(0, n, self._batch_size):
                # materialize the memmap slice before the sharded put:
                # device_put of a raw memmap view takes a ~10x slower
                # transfer path than a regular contiguous array (measured)
                host = np.ascontiguousarray(
                    self._arr[start : start + self._batch_size]
                )
                status = self._status[start : start + self._batch_size]
                if self._pad_batches:
                    host, status = _pad_batch_host(
                        host, status, self._batch_size
                    )
                if self._sharding is not None:
                    dev = jax.device_put(host, self._sharding)
                else:
                    dev = jax.device_put(host)
                while not stop.is_set():
                    try:
                        q.put((dev, status), timeout=0.25)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:
            errbox.append(e)
        finally:
            _put_sentinel(q, stop)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()
        errbox: list = []
        thread = threading.Thread(
            target=self._producer, args=(q, stop, errbox), daemon=True
        )
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if errbox:
                        raise errbox[0]
                    return
                yield item
        finally:
            stop.set()

    def __len__(self):
        return -(-self._arr.shape[0] // self._batch_size)


def encode_corpus_streaming(codec, paths, mesh=None, cache_path=None,
                            **loader_kwargs):
    """End-to-end prefetched corpus encode: paths -> per-batch codes.

    Combines the background loader with the sharded encoder; decode/H2D of
    batch k+1 overlaps the chip encoding batch k. With ``cache_path`` set
    (a :func:`build_corpus_cache` artifact), batches come from the PCM
    memmap instead of per-epoch WAV decoding.

    :return: list of (codes, delta, status) per batch (device-resident).
    """
    from audiocodec_tpu.parallel import corpus as _corpus
    from audiocodec_tpu.parallel import mesh as _mesh

    if mesh is None:
        mesh = _mesh.make_mesh()
    loader_kwargs.setdefault("sharding", _mesh.waveform_sharding(mesh))
    encoder = _corpus.make_corpus_encoder(codec, mesh, quantized=True)
    dp = mesh.shape["dp"]

    if cache_path is not None:
        framing = {
            k: loader_kwargs.pop(k)
            for k in ("clip_seconds", "sample_rate", "channels")
            if k in loader_kwargs
        }
        loader_kwargs.pop("wire_dtype", None)
        loader_kwargs.pop("decode_threads", None)
        if not ({"clip_seconds", "sample_rate"} <= framing.keys()):
            # without the framing there is nothing to validate the cache
            # against, and an unvalidated positional cache can silently
            # pair the wrong audio with a clip — refuse instead
            raise ValueError(
                "cache_path requires clip_seconds= and sample_rate= so "
                "the cache can be validated against this corpus"
            )
        # catch a stale/mismatched cache loudly (it is positional:
        # silently wrong pairing would encode the wrong audio)
        validate_corpus_cache(
            cache_path, paths,
            clip_seconds=framing["clip_seconds"],
            sample_rate=framing["sample_rate"],
            channels=framing.get("channels", 1),
        )
        loader = CachedCorpusLoader(cache_path, **loader_kwargs)
    else:
        loader = PrefetchingCorpusLoader(paths, **loader_kwargs)

    results = []
    n = codec.mdct.filters_n
    for batch, status in loader:
        if jnp.issubdtype(batch.dtype, jnp.integer):
            batch = _dequant_wire(batch, jnp.dtype(codec.mdct.compute_dtype))
        # clip_seconds need not be block-aligned; trim to whole MDCT blocks
        usable = batch.shape[1] - batch.shape[1] % n
        if usable == 0:
            raise ValueError(
                f"clip_seconds yields {batch.shape[1]} frames — shorter "
                f"than one MDCT block (filters_n={n})"
            )
        batch = batch[:, :usable]
        real = batch.shape[0]
        if real % dp != 0:
            pad = _mesh.pad_batch_to(real, dp) - real
            batch = jnp.concatenate(
                [batch, jnp.zeros((pad,) + batch.shape[1:], batch.dtype)]
            )
        codes, delta = encoder(batch)
        results.append((codes[:real], delta[:real], status))
    return results
