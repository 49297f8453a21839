"""Batched-queue inference server (hiddenpose_tpu/serve.py).

The reference has no serving path (its test.py is offline eval); these
tests pin the server's contract: per-request results are IDENTICAL to a
direct forward regardless of how requests pack into batches, partial
batches flush after max_wait, concurrent submitters all resolve, and
close() drains."""

import threading

import numpy as np
import pytest

import jax.numpy as jnp

from hiddenpose_tpu.config import default_config
from hiddenpose_tpu.serve import InferenceServer
from hiddenpose_tpu.train.step import make_forward

SIZE = 16
CFG = default_config().tiny(SIZE)


def _meas(seed):
    rng = np.random.RandomState(seed)
    return rng.rand(1, SIZE, SIZE, SIZE).astype(np.float32)


@pytest.fixture(scope="module")
def server():
    srv = InferenceServer(
        CFG, batch_size=4, dtype="float32", max_wait_ms=20.0, rng_seed=7
    )
    yield srv
    srv.close()


def test_results_match_direct_forward(server):
    """Every request's joints equal a direct forward of the same volume —
    batching and tail padding must be inert per-sample (eval BatchNorm
    uses running stats; GroupNorm/FFT are per-sample)."""
    n = 7  # one full batch + a padded tail
    futs = [server.submit(_meas(i)) for i in range(n)]
    got = [f.result(timeout=300) for f in futs]

    fwd = make_forward(server.model)
    direct = np.stack(
        [
            np.asarray(
                fwd(server.variables, jnp.asarray(_meas(i)[None]), server.lct)[0]
            )[0].reshape(-1, 3)
            for i in range(n)
        ]
    )
    for i in range(n):
        assert got[i]["joints"].shape == direct[i].shape
        np.testing.assert_allclose(
            got[i]["joints"], direct[i], rtol=1e-5, atol=1e-5
        )


def test_partial_batch_flushes_and_pads(server):
    before = server.stats()
    out = server.infer(_meas(100))
    assert np.isfinite(out["joints"]).all()
    after = server.stats()
    assert after["batches"] >= before["batches"] + 1
    assert after["padded"] > before["padded"]  # tail was padded, not held
    assert 0.0 < after["mean_fill"] <= 1.0


def test_concurrent_submitters(server):
    results = {}

    def client(i):
        results[i] = server.infer(_meas(200 + i))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 6
    for i in range(6):
        assert np.isfinite(results[i]["joints"]).all()


def test_input_validation(server):
    with pytest.raises(ValueError):
        server.submit(np.zeros((2, SIZE, SIZE), np.float32))
    # (T,H,W) is promoted to (1,T,H,W)
    f = server.submit(np.zeros((SIZE, SIZE, SIZE), np.float32))
    assert f.result(timeout=300)["joints"].shape[-1] == 3


def test_close_drains_and_rejects():
    srv = InferenceServer(
        CFG, batch_size=2, dtype="float32", max_wait_ms=1.0, rng_seed=7
    )
    futs = [srv.submit(_meas(300 + i)) for i in range(3)]
    srv.close()
    for f in futs:
        assert np.isfinite(f.result(timeout=300)["joints"]).all()
    with pytest.raises(RuntimeError):
        srv.submit(_meas(0))
    srv.close()  # idempotent


def test_bf16_server_transfer_dtype():
    """A bf16 server casts requests to bf16 on host before the device
    transfer (the wire cost halves; the model casts activations anyway)
    and still returns finite f32 joints."""
    import jax.numpy as jnp2

    srv = InferenceServer(
        CFG, batch_size=2, dtype="bfloat16", max_wait_ms=1.0, rng_seed=7
    )
    try:
        assert srv._transfer_dtype == jnp2.bfloat16
        out = srv.infer(_meas(42))
        assert out["joints"].dtype == np.float32
        assert np.isfinite(out["joints"]).all()
    finally:
        srv.close()
