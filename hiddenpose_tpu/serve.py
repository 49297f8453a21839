"""Batched-queue inference server for NlosPose.

The reference ships no serving path — its `test.py` is offline batch eval
(`/root/reference/test.py:60-118`).  On TPU the throughput-optimal
operating point is a FIXED larger batch (XLA compiles one static-shape
program; the 135c sweep measured f32 b2 29.3 → bf16 b8 33.1 vol/s/chip),
but callers arrive one capture at a time.  This server bridges the two:
requests queue; a pump thread packs up to ``batch_size`` of them, pads the
tail by repeating the last request so the program shape never changes
(per-sample results are batch-independent — eval-mode BatchNorm uses
running stats, GroupNorm/FFT are per-sample — so padding is inert), runs
the one jitted program, and resolves per-request futures.

TPU-first notes:

* ONE compiled program, ever: the batch dimension is static.  A varying
  tail batch would force a recompile per distinct fill (20-40 s each on
  this toolchain) — padding is strictly cheaper than even one recompile.
* The pump fetches results to host via ``np.asarray`` — on the axon relay
  ``block_until_ready`` is a no-op, so a device→host fetch is the only
  real completion fence (same rule as bench.py::_sync).
* Device work stays on the single pump thread: JAX dispatch is not
  free-threaded, and the relay allows one session per process — callers
  only touch numpy and futures.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from hiddenpose_tpu.config import Config, t128_config
from hiddenpose_tpu.models.nlospose import build_nlospose
from hiddenpose_tpu.train.step import make_forward

_STOP = object()


class InferenceServer:
    """Turns single-capture requests into fixed-batch TPU inference.

    Parameters
    ----------
    cfg : model/config preset (default: the t128 production config).
    variables : restored model variables ({'params', 'batch_stats'});
        random-init when omitted (demo/bench mode).
    batch_size : the static compiled batch (8 = the measured-optimal
        serving point on v5e).
    dtype : activation compute dtype; 'bfloat16' is the serving default
        (head rel err ~5e-3 vs f32, which itself runs bf16 MXU passes at
        JAX default precision).  'float32' restores the parity path.
    max_wait_ms : how long the pump holds an open batch for more arrivals
        before flushing it padded.  Bounds added p50 latency under light
        traffic; under saturation batches fill instantly and this never
        triggers.
    """

    def __init__(
        self,
        cfg: Optional[Config] = None,
        variables=None,
        *,
        batch_size: int = 8,
        dtype: str = "bfloat16",
        max_wait_ms: float = 5.0,
        rng_seed: int = 0,
    ):
        cfg = cfg if cfg is not None else t128_config()
        if dtype:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, compute_dtype=dtype)
            )
        self.cfg = cfg
        self.batch_size = int(batch_size)
        self.max_wait = float(max_wait_ms) / 1000.0
        # Cast requests to the serving compute dtype on HOST, before the
        # host→device transfer: the model's first op casts activations to
        # compute_dtype anyway, so shipping f32 bytes to a bf16 server
        # just doubles the wire cost — and on a tunneled device the input
        # transfer IS the serving bottleneck (measured 0.05 GB/s h2d,
        # 1.24 s per 67 MB b8 batch vs 0.24 s of compute; tpu_jobs/140).
        self._transfer_dtype = (
            jnp.dtype(cfg.model.compute_dtype)
            if jnp.dtype(cfg.model.compute_dtype) == jnp.bfloat16
            else np.float32
        )
        self.model, self.lct = build_nlospose(cfg.model)
        t = cfg.model.time_size
        im = cfg.model.image_size[0]
        self._meas_shape = (1, t, im, im)
        if variables is None:
            ex = jnp.zeros((1,) + self._meas_shape, jnp.float32)
            variables = jax.jit(
                lambda r, m: self.model.init(r, m, self.lct, train=False)
            )(jax.random.PRNGKey(rng_seed), ex)
            variables = {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            }
        self.variables = variables
        self._forward = make_forward(self.model)
        self._q: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._stats = dict(
            requests=0, batches=0, padded=0, device_s=0.0, errors=0
        )
        self._closed = False
        self._pump = threading.Thread(
            target=self._run, name="hp-serve-pump", daemon=True
        )
        self._pump.start()

    # -- client API --------------------------------------------------

    def submit(self, meas: np.ndarray) -> Future:
        """Enqueue one capture; resolves to {'joints': (J,3) np.float32}.

        Accepts (T, H, W) or (1, T, H, W) float measurement volumes."""
        if self._closed:
            raise RuntimeError("server closed")
        meas = np.asarray(meas, np.float32)
        if meas.ndim == 3:
            meas = meas[None]
        if meas.shape != self._meas_shape:
            raise ValueError(
                f"expected meas {self._meas_shape}, got {meas.shape}"
            )
        fut: Future = Future()
        self._q.put((meas, fut))
        return fut

    def infer(self, meas: np.ndarray) -> Dict[str, np.ndarray]:
        """Synchronous convenience wrapper around submit()."""
        return self.submit(meas).result()

    def warmup(self) -> None:
        """Compile + run the serving program once (20-40 s cold on this
        toolchain) so the first real request doesn't pay it."""
        z = np.zeros(self._meas_shape, np.float32)
        self.submit(z).result()

    def stats(self) -> Dict[str, float]:
        """Counters + derived rates.  `volumes_per_sec` is a conservative
        lower bound under load: per-batch times are launch→fetch spans,
        which overlap across the one-deep pipeline, so their sum exceeds
        wall time — measure externally (bench.py serve mode) for the true
        wall-clock throughput."""
        with self._lock:
            s = dict(self._stats)
        s["mean_fill"] = (
            s["requests"] / (s["batches"] * self.batch_size)
            if s["batches"]
            else 0.0
        )
        s["volumes_per_sec"] = (
            s["requests"] / s["device_s"] if s["device_s"] > 0 else 0.0
        )
        return s

    def close(self) -> None:
        """Drain in-flight work and stop the pump (idempotent)."""
        if self._closed:
            return
        self._closed = True
        self._q.put(_STOP)
        self._pump.join(timeout=600)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- pump --------------------------------------------------------

    def _collect(self) -> Tuple[List, bool]:
        """Block for one request, then hold the batch open up to
        max_wait for more.  Returns (requests, stop_seen)."""
        first = self._q.get()
        if first is _STOP:
            return [], True
        reqs = [first]
        deadline = time.perf_counter() + self.max_wait
        while len(reqs) < self.batch_size:
            left = deadline - time.perf_counter()
            try:
                # Past the deadline, still DRAIN whatever is already
                # queued (get_nowait) — flushing a half-empty batch while
                # requests sit in the queue costs a whole extra program
                # run (measured: mean_fill 0.49 under open-loop flood
                # before this, tpu_jobs/139).  The deadline only bounds
                # how long we wait for requests that haven't arrived.
                nxt = (self._q.get(timeout=left) if left > 0
                       else self._q.get_nowait())
            except queue.Empty:
                break
            if nxt is _STOP:
                return reqs, True
            reqs.append(nxt)
        return reqs, False

    def _launch(self, reqs: List, t0: float):
        """Dispatch one padded batch to the device WITHOUT a host sync —
        JAX dispatch is async, so the transfer + program for batch N+1
        queue up behind batch N and the device never idles while the
        pump is fetching N's results (one-deep pipeline; the
        host→device input transfer is the dominant per-batch cost on a
        tunneled device).  Returns (reqs, device_output, t0); raises are
        converted to resolved-with-exception futures and None."""
        try:
            meas = np.stack(
                [m for m, _ in reqs]
                + [reqs[-1][0]] * (self.batch_size - len(reqs))
            ).astype(self._transfer_dtype)
            joints, _ = self._forward(
                self.variables, jnp.asarray(meas), self.lct
            )
            return reqs, joints, t0
        except Exception as e:  # trace/compile/transfer failures
            with self._lock:
                self._stats["errors"] += 1
            for _, fut in reqs:
                fut.set_exception(e)
            return None

    def _resolve(self, pending) -> None:
        reqs, joints, t0 = pending
        n = len(reqs)
        try:
            joints = np.asarray(joints, np.float32)  # host fetch = fence
            # (B, J*3) flat (x,y,z) triplets (ops/softargmax.py) -> (B, J, 3)
            joints = joints.reshape(self.batch_size, -1, 3)
        except Exception as e:  # execution failures surface at the fetch
            with self._lock:
                self._stats["errors"] += 1
            for _, fut in reqs:
                fut.set_exception(e)
            return
        dt = time.perf_counter() - t0
        with self._lock:
            self._stats["requests"] += n
            self._stats["batches"] += 1
            self._stats["padded"] += self.batch_size - n
            self._stats["device_s"] += dt
        for i, (_, fut) in enumerate(reqs):
            fut.set_result({"joints": joints[i]})

    def _run(self) -> None:
        pending = None
        stop = False
        while not stop:
            if pending is None:
                reqs, stop = self._collect()
            else:
                # Work in flight: grab another batch if requests are
                # already waiting, else resolve the in-flight one first
                # (never block on an empty queue while results are ready).
                try:
                    first = self._q.get_nowait()
                except queue.Empty:
                    first = None
                if first is _STOP:
                    reqs, stop = [], True
                elif first is None:
                    reqs = []
                else:
                    reqs = [first]
                    while len(reqs) < self.batch_size:
                        try:
                            nxt = self._q.get_nowait()
                        except queue.Empty:
                            break
                        if nxt is _STOP:
                            stop = True
                            break
                        reqs.append(nxt)
            launched = self._launch(reqs, time.perf_counter()) if reqs \
                else None
            if pending is not None:
                self._resolve(pending)
            pending = launched
        if pending is not None:
            self._resolve(pending)
        # resolve anything still queued after close()
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is _STOP:
                continue
            reqs = [item]
            while len(reqs) < self.batch_size:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is not _STOP:
                    reqs.append(nxt)
            launched = self._launch(reqs, time.perf_counter())
            if launched is not None:
                self._resolve(launched)
