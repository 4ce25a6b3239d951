"""High-throughput serving runtime: batched request aggregation + pipelining.

The production-serving layer the reference (a synchronous library) has no
analog for: requests are aggregated into fixed-size device batches, host
marshalling for batch i+1 overlaps device execution of batch i (JAX dispatch
is async), and callers get futures.  This is the framework's
executor/scheduler component (SURVEY.md §5 aux subsystems).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field

from ..utils import config as cfg
from . import ecdsa as ecdsamod


@dataclass
class _Pending:
    pub: object
    digest: bytes
    sig: bytes
    future: Future = field(default_factory=Future)


class _KeyCache:
    """Fixed-capacity device-resident signer table for the keyed fast path.

    Distinct signers seen by the service accumulate into one PubkeyCache
    (padded to `capacity` so the device trace shape is stable); per-batch
    uploads then carry 4-byte indices instead of 33-byte keys.  Returns
    None from lookup() once capacity would overflow — callers fall back to
    the unkeyed pipeline."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.index: dict = {}
        self.points: list = []
        self.cache = None

    def lookup(self, pubs):
        import numpy as np
        uniq_new = []
        seen = set()
        for p in pubs:
            if p not in self.index and p not in seen:
                seen.add(p)
                uniq_new.append(p)
        if len(self.points) + len(uniq_new) > self.capacity:
            return None
        if uniq_new or self.cache is None:
            for p in uniq_new:
                self.index[p] = len(self.points)
                self.points.append(p.point)
            if not self.points:
                return None
            pad = [self.points[0]] * (self.capacity - len(self.points))
            self.cache = ecdsamod.PubkeyCache(self.points + pad)
        return np.asarray([self.index[p] for p in pubs], np.int32)


class VerifyService:
    """Aggregating ECDSA verify service.

    submit() enqueues one (pub, digest, sig); a worker thread drains the
    queue into max_lanes-sized batches and runs the device pipeline,
    resolving each future with a bool.  flush() forces a partial batch.
    """

    def __init__(self, opts: cfg.ECDSAOptions | None = None,
                 max_lanes: int = 16384, max_wait_s: float = 0.005,
                 max_pending: int = 0, key_cache_capacity: int = 0):
        """max_pending > 0 bounds the intake queue: submit() blocks once
        that many requests are in flight (backpressure instead of unbounded
        memory growth under overload).

        key_cache_capacity > 0 enables the keyed fast path: up to that many
        distinct signers live device-resident (`ecdsa.PubkeyCache`), and
        batches upload per-lane indices instead of keys — the win for
        serving shapes that verify many signatures per signer."""
        self.opts = opts or cfg.ECDSAOptions()
        self.max_lanes = max_lanes
        self.max_wait_s = max_wait_s
        self._keys = (_KeyCache(key_cache_capacity)
                      if key_cache_capacity > 0 else None)
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        self.batches = 0
        self.verified = 0

    def submit(self, pub, digest: bytes, sig: bytes,
               timeout: float | None = None) -> Future:
        """Enqueue one verification; blocks (up to timeout) when the
        pending queue is full.  Raises queue.Full on timeout."""
        if self._closed:
            raise RuntimeError("service closed")
        p = _Pending(pub, digest, sig)
        self._q.put(p, timeout=timeout)
        return p.future

    def flush(self) -> None:
        """Block until everything currently queued has resolved."""
        done = Future()
        self._q.put(done)
        done.result()

    def close(self) -> None:
        self._closed = True
        self.flush()

    # ------------------------------------------------------------------

    def _run(self) -> None:
        while True:
            batch: list[_Pending] = []
            barriers: list[Future] = []
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            deadline = None
            while True:
                if isinstance(item, Future):
                    barriers.append(item)
                    break
                batch.append(item)
                if len(batch) >= self.max_lanes:
                    break
                try:
                    import time
                    if deadline is None:
                        deadline = time.monotonic() + self.max_wait_s
                    timeout = max(deadline - time.monotonic(), 0)
                    item = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
            if batch:
                self._process(batch)
            for b in barriers:
                b.set_result(True)

    def _fast_path_ok(self, batch: list[_Pending]) -> bool:
        """The arrays pipeline handles the common serving shape: ASN.1
        signatures + 32-byte digests (one batched C++ DER parse, all
        marshalling vectorized).  Everything else takes the generic path."""
        return (self.opts.encoding == cfg.SignatureEncoding.ASN1
                and cfg.HASH_SIZES.get(self.opts.hash) == 32
                and all(len(p.digest) == 32 for p in batch)
                and all(hasattr(p.pub, "compressed_bytes") for p in batch))

    def _process(self, batch: list[_Pending]) -> None:
        try:
            if self._fast_path_ok(batch):
                import numpy as np
                n = len(batch)
                max_len = max(len(p.sig) for p in batch) or 1
                sig_arr = np.zeros((n, max_len), np.uint8)
                len_arr = np.zeros((n,), np.int32)
                dig_arr = np.zeros((n, 32), np.uint8)
                for i, p in enumerate(batch):
                    sig_arr[i, :len(p.sig)] = np.frombuffer(p.sig, np.uint8)
                    len_arr[i] = len(p.sig)
                    dig_arr[i] = np.frombuffer(p.digest, np.uint8)
                idx = (self._keys.lookup([p.pub for p in batch])
                       if self._keys is not None
                       and all(hasattr(p.pub, "point") for p in batch)
                       else None)
                if idx is not None:
                    st = ecdsamod.verify_batch_arrays_keyed(
                        self._keys.cache, idx, dig_arr, sig_arr, len_arr,
                        reject_malleable=self.opts.reject_malleable)
                else:
                    pub_arr = np.zeros((n, 33), np.uint8)
                    for i, p in enumerate(batch):
                        pub_arr[i] = np.frombuffer(p.pub.compressed_bytes(),
                                                   np.uint8)
                    st = ecdsamod.verify_batch_arrays(
                        pub_arr, dig_arr, sig_arr, len_arr,
                        reject_malleable=self.opts.reject_malleable)
                oks = [s == 0 for s in st]
            else:
                oks = ecdsamod.verify_batch(
                    [p.pub for p in batch],
                    [p.digest for p in batch],
                    [p.sig for p in batch],
                    opts=self.opts)
        except Exception as e:  # resolve everything exceptionally
            for p in batch:
                p.future.set_exception(e)
            return
        self.batches += 1
        self.verified += len(batch)
        for p, ok in zip(batch, oks):
            p.future.set_result(bool(ok))
