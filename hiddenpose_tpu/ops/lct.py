"""Batched, differentiable Light-Cone-Transform reconstruction in JAX.

This is the TPU-native redesign of the reference's LCT layer
(`/root/reference/models/feature_propagation.py:46-257`, standalone copy at
`models/tflct.py:11-179`, NumPy version at `utils/lct.py:9-84` — the reference
carries three copies; this framework has exactly one).

Differences from the reference, by design:

* **One-sided rFFT.** The measurement cube and the PSF are real, so the whole
  filtering step runs on `jnp.fft.rfftn`/`irfftn` over the zero-padded
  (2T, 2H, 2W) volume with only W+1 frequencies on the last axis — half the
  FFT flops and memory of the reference's `torch.rfft(..., onesided=False)` +
  manual complex arithmetic (`feature_propagation.py:228-235`).  Because the
  Wiener filter is conjugate-symmetric, `irfftn` of the product equals the
  real part the reference extracts.
* **Split-complex constants.** The inverse filter is stored as two float32
  planes (real, imag) rather than complex64: the axon TPU runtime cannot
  round-trip complex arrays to the host, and split storage also keeps the
  constants eligible for lower-precision experiments.
* **No host loop over the batch.** The reference pads each sample with a
  Python loop of `torch.cat` (`feature_propagation.py:195-201`); here the
  time window is a static (begin, end) pair applied with one
  `dynamic_update_slice`, keeping shapes static for XLA.
* **Resampling as batched MXU matmuls.** The M x M temporal resampling is an
  einsum over the flattened spatial axes — a single large matmul per volume.

Everything here is a pure function of an :class:`LCTParams` pytree (arrays
are pytree leaves, config fields are static metadata), so ``params`` can be
passed straight through `jax.jit` boundaries.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hiddenpose_tpu.ops import psf as psf_ops

C_LIGHT = 3e8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LCTParams:
    """Device constants of one LCT configuration.

    Shapes for time size T=M and spatial size N (H=W=N):
      gridz:       (M,)           radiometric falloff grid, 0..1
      mtx:         (M, M)         forward temporal resampling
      mtxi:        (M, M)         inverse temporal resampling (= mtx.T)
      invpsf_real: (2M, 2N, N+1)  one-sided inverse filter, real part
      invpsf_imag: (2M, 2N, N+1)  one-sided inverse filter, imag part
      lapw:        (5, 5, 5)      LoG sharpening kernel ('bp' mode only)
    """

    gridz: jax.Array
    mtx: jax.Array
    mtxi: jax.Array
    invpsf_real: jax.Array
    invpsf_imag: jax.Array
    lapw: Optional[jax.Array]
    time_size: int = dataclasses.field(metadata=dict(static=True))
    image_size: int = dataclasses.field(metadata=dict(static=True))
    material: str = dataclasses.field(metadata=dict(static=True))
    mode: str = dataclasses.field(metadata=dict(static=True))


def make_lct_params(
    image_size: int,
    time_size: int,
    bin_len: float,
    wall_size: float = 2.0,
    mode: str = "lct",
    material: str = "diffuse",
    snr: float = 1e-1,
) -> LCTParams:
    """Precompute LCT constants (host NumPy) and upload to device.

    Mirrors `LCT._parpareparam` (`models/feature_propagation.py:71-109`):
    slope = (wall_size/2) / (T * bin_len).
    """
    assert 2 ** int(np.log2(time_size)) == time_size, "time_size must be 2^k"
    assert mode in ("lct", "bp")
    assert material in ("diffuse", "specular")

    width = wall_size / 2.0
    bin_resolution = bin_len / C_LIGHT
    trange = time_size * C_LIGHT * bin_resolution
    slope = width / trange

    gridz = np.arange(time_size, dtype=np.float32) / (time_size - 1)
    mtx, mtxi = psf_ops.resampling_operator(time_size)
    invpsf = psf_ops.wiener_inverse_psf(
        image_size, time_size, slope, snr=snr, mode=mode, onesided=True
    )
    lapw = psf_ops.filter_laplacian() if mode == "bp" else None

    return LCTParams(
        gridz=jnp.asarray(gridz),
        mtx=jnp.asarray(mtx),
        mtxi=jnp.asarray(mtxi),
        invpsf_real=jnp.asarray(np.real(invpsf).astype(np.float32)),
        invpsf_imag=jnp.asarray(np.imag(invpsf).astype(np.float32)),
        lapw=None if lapw is None else jnp.asarray(lapw),
        time_size=int(time_size),
        image_size=int(image_size),
        material=material,
        mode=mode,
    )


def embed_time_window(
    x: jax.Array, time_begin: int, time_end: int, time_size: int
) -> jax.Array:
    """Place a (B, t, H, W) measurement into the [0, time_size) window.

    Reference pads with explicit zero tensors per sample
    (`feature_propagation.py:195-201`); begin/end are static ints here (the
    live model always uses (0, T), `models/NlosPose.py:17-18,53`).
    """
    b, t, h, w = x.shape
    assert time_end - time_begin == t and 0 <= time_begin and time_end <= time_size
    if t == time_size:
        return x
    out = jnp.zeros((b, time_size, h, w), dtype=x.dtype)
    return jax.lax.dynamic_update_slice(out, x, (0, time_begin, 0, 0))


def _resample(mat: jax.Array, x: jax.Array) -> jax.Array:
    """(M, M) @ (B, M, H, W) over the time axis — one MXU matmul.

    Precision: HP_LCT_PREC ('default' | 'high' | 'highest', read at trace
    time).  At JAX's default matmul precision the TPU runs ONE bf16 pass —
    8 mantissa bits against the huge dynamic range the z^4 falloff leaves
    in the histogram, in the physics layer every downstream stage consumes
    (and in its transpose, every gradient).  These two M x M matmuls are
    ~0.1% of the step FLOPs, so 'highest' costs nothing measurable; the
    round-5 attribution (tpu_jobs/135a) decides the default.
    """
    b, t, h, w = x.shape
    prec = os.environ.get("HP_LCT_PREC", "default")
    y = jnp.einsum(
        "ij,bjk->bik", mat, x.reshape(b, t, h * w),
        preferred_element_type=jnp.float32,
        precision=None if prec in ("", "default") else prec,
    )
    return y.reshape(b, t, h, w)


def lct_apply(
    meas: jax.Array,
    params: LCTParams,
    time_begin: int = 0,
    time_end: Optional[int] = None,
    batch_chunk: int = 0,
) -> jax.Array:
    """Reconstruct hidden-scene volumes from transient measurements.

    Args:
      meas: (B, T', H, W) float — photon histograms (time-major). T' may be
        shorter than params.time_size, in which case it is embedded at
        ``time_begin``.
      params: constants from :func:`make_lct_params`.
      batch_chunk: when > 0 and it divides B, the FFT filtering section runs
        sequentially over batch chunks of this size via ``lax.map`` so the
        2x-padded buffers ((B, 2T, 2H, 2W) f32 + one-sided spectrum — 134 MB
        per f32 sample at 128^3) are only live for one chunk at a time.
        Fixes the round-1 batch-8 HBM-pressure regression (VERDICT #8) at
        zero cost for small batches (0 = fully batched, the default).

    Returns:
      (B, T, H, W) float32 reconstructed volume (z-major).

    Math matches `LCT.forward` (`models/feature_propagation.py:186-257`):
    falloff → resample → zero-pad 2x → FFT → Wiener multiply → iFFT →
    crop → inverse resample.
    """
    b_total = meas.shape[0]
    if batch_chunk and b_total > batch_chunk and b_total % batch_chunk == 0:
        chunks = meas.reshape((b_total // batch_chunk, batch_chunk)
                              + meas.shape[1:])
        vols = jax.lax.map(
            lambda m: lct_apply(m, params, time_begin, time_end), chunks
        )
        return vols.reshape((b_total,) + vols.shape[2:])

    T = params.time_size
    N = params.image_size
    if time_end is None:
        time_end = time_begin + meas.shape[1]
    x = embed_time_window(meas, time_begin, time_end, T)
    b = x.shape[0]
    assert x.shape == (b, T, N, N), f"bad meas shape {x.shape}"

    x = x.astype(jnp.float32)

    # Radiometric falloff: z^4 (diffuse) or z^2 (specular)
    # (feature_propagation.py:213-217).
    power = 4 if params.material == "diffuse" else 2
    x = x * (params.gridz ** power)[None, :, None, None]

    x = _resample(params.mtx, x)

    # Zero-pad to (2T, 2N, 2N) and filter in the frequency domain.
    pad = jnp.zeros((b, 2 * T, 2 * N, 2 * N), dtype=jnp.float32)
    pad = jax.lax.dynamic_update_slice(pad, x, (0, 0, 0, 0))

    freq = jnp.fft.rfftn(pad, axes=(1, 2, 3))
    fr, fi = jnp.real(freq), jnp.imag(freq)
    pr, pi = params.invpsf_real[None], params.invpsf_imag[None]
    filt = jax.lax.complex(fr * pr - fi * pi, fr * pi + fi * pr)
    vol = jnp.fft.irfftn(filt, s=(2 * T, 2 * N, 2 * N), axes=(1, 2, 3))
    vol = vol[:, :T, :N, :N]

    vol = _resample(params.mtxi, vol)

    if params.mode == "bp":
        # LoG sharpening + zeroed first slice (feature_propagation.py:246-253).
        k = params.lapw.shape[0]
        p = (k - 1) // 2
        padded = jnp.pad(
            vol[:, None], ((0, 0), (0, 0), (p, p), (p, p), (p, p)), mode="edge"
        )
        vol = jax.lax.conv_general_dilated(
            padded,
            params.lapw[None, None].astype(vol.dtype),
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )[:, 0]
        vol = vol.at[:, :1].set(0.0)

    return vol


def lct_apply_sharded(
    meas: jax.Array,
    params: LCTParams,
    mesh,
    *,
    time_begin: int = 0,
    time_end: Optional[int] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> jax.Array:
    """`lct_apply` with the padded FFT cube spatially sharded over a mesh.

    SURVEY §2.6 names sharding the (2T, 2H, 2W) cube as the one meaningful
    TP/SP decomposition in this workload: at 256^3 the padded f32 buffer is
    512 MB/sample plus a one-sided complex spectrum of the same order —
    batch 4 cannot fit one v5e chip (16 GB) unsharded.

    Decomposition (hand-rolled distributed FFT; XLA's SPMD partitioner
    would all-gather around `fftn` instead of transposing):

      1. shard H of the padded cube over ``model_axis`` (batch over
         ``data_axis``); rFFT over W and FFT over T are shard-local;
      2. `all_to_all` transposes the shards H→T (one ICI collective moving
         each shard once);
      3. FFT over the now-local H; Wiener multiply against the
         T-sharded inverse-PSF slab; iFFT over H;
      4. `all_to_all` back T→H; local iFFT over T + irFFT over W.

    Per-shard peak memory is 1/n_model of the unsharded filtering section;
    numerics are exact (same flops, same order — verified vs `lct_apply`
    in `tests/test_parallel.py`).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    T = params.time_size
    N = params.image_size
    if time_end is None:
        time_end = time_begin + meas.shape[1]
    x = embed_time_window(meas, time_begin, time_end, T)
    b = x.shape[0]
    assert x.shape == (b, T, N, N), f"bad meas shape {x.shape}"
    n_model = mesh.shape[model_axis]
    assert (2 * N) % n_model == 0 and (2 * T) % n_model == 0

    x = x.astype(jnp.float32)
    power = 4 if params.material == "diffuse" else 2
    x = x * (params.gridz ** power)[None, :, None, None]
    x = _resample(params.mtx, x)

    pad = jnp.zeros((b, 2 * T, 2 * N, 2 * N), dtype=jnp.float32)
    pad = jax.lax.dynamic_update_slice(pad, x, (0, 0, 0, 0))
    pad = jax.lax.with_sharding_constraint(
        pad, NamedSharding(mesh, P(data_axis, None, model_axis, None))
    )

    def fft_block(pad_l, pr_l, pi_l):
        f = jnp.fft.rfft(pad_l, axis=3)
        f = jnp.fft.fft(f, axis=1)
        f = jax.lax.all_to_all(
            f, model_axis, split_axis=1, concat_axis=2, tiled=True
        )
        f = jnp.fft.fft(f, axis=2)
        f = f * jax.lax.complex(pr_l, pi_l)[None]
        f = jnp.fft.ifft(f, axis=2)
        f = jax.lax.all_to_all(
            f, model_axis, split_axis=2, concat_axis=1, tiled=True
        )
        f = jnp.fft.ifft(f, axis=1)
        return jnp.fft.irfft(f, n=pad_l.shape[3], axis=3)

    vol = jax.shard_map(
        fft_block,
        mesh=mesh,
        in_specs=(
            P(data_axis, None, model_axis, None),
            P(model_axis, None, None),
            P(model_axis, None, None),
        ),
        out_specs=P(data_axis, None, model_axis, None),
        # FFT's transpose rule produces cotangents without varying-manual-
        # axes annotations; the vma checker rejects them under autodiff
        # (training differentiates through this block).
        check_vma=False,
    )(pad, params.invpsf_real, params.invpsf_imag)

    vol = vol[:, :T, :N, :N]
    return _resample(params.mtxi, vol)


def lct_apply_bdthw(
    meas: jax.Array,
    params: LCTParams,
    time_begin: int = 0,
    time_end: Optional[int] = None,
) -> jax.Array:
    """Channelled variant matching the reference call signature.

    meas: (B, D, T', H, W) → (B, D, T, H, W); channels fold into the batch
    exactly as `feature_propagation.py:211` does with its view().
    """
    b, d = meas.shape[:2]
    flat = meas.reshape((b * d,) + meas.shape[2:])
    vol = lct_apply(flat, params, time_begin, time_end)
    return vol.reshape((b, d) + vol.shape[1:])
