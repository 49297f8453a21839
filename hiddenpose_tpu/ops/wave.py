"""Virtual-wave (phasor-field) helper ops.

Re-design of `/root/reference/utils/helper.py:140-202` (`gaussianwin`,
`waveconvparam`, `waveconv`) — the building blocks of the phasor
reconstruction method the reference keeps disabled
(`models/tfmodule.py:42-46` commented out).  The per-pixel Python
convolution loop of the reference (`helper.py:193-200`) is replaced by one
batched 'same' convolution along the time axis, vectorised over all wall
pixels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

C_LIGHT = 3e8


def gaussian_window(length: int, alpha: float) -> np.ndarray:
    """MATLAB-style gausswin: exp(-0.5 (alpha n / (N/2))^2), n centred
    (`utils/helper.py:140-147`)."""
    n = length - 1
    k = np.arange(length, dtype=np.float64) - n / 2.0
    return np.exp(-0.5 * (alpha * k / (n / 2.0)) ** 2).astype(np.float32)


def virtual_wave_kernels(
    bin_resolution: float, virtual_wavelength: float, cycles: float,
    sigma: float = 0.3,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos_kernel, sin_kernel): Gaussian-windowed quadrature pair
    (`utils/helper.py:150-168`)."""
    s_z = bin_resolution * C_LIGHT
    samples = int(round(cycles * virtual_wavelength / s_z))
    num_cycles = samples * s_z / virtual_wavelength
    grid = np.arange(1, samples + 1, dtype=np.float64)
    phase = 2 * np.pi * num_cycles * grid / samples
    window = gaussian_window(samples, 1.0 / sigma).astype(np.float64)
    cos_k = (np.cos(phase) * window).astype(np.float32)
    sin_k = (np.sin(phase) * window).astype(np.float32)
    return cos_k, sin_k


def wave_convolve(
    data_thw: jax.Array,
    bin_resolution: float,
    virtual_wavelength: float,
    cycles: float,
) -> Tuple[jax.Array, jax.Array]:
    """(wave_cos, wave_sin), each (T, H, W): 'same' correlation of every
    pixel's transient with the quadrature kernels.

    Matches `utils/helper.py:171-202` (note the reference stores the
    sin-convolved signal in its 'real'/wave_sin slot and cos in wave_cos;
    preserved).  One batched conv instead of N^2 Python loops.
    """
    cos_k, sin_k = virtual_wave_kernels(
        bin_resolution, virtual_wavelength, cycles
    )
    t, h, w = data_thw.shape
    sig = data_thw.reshape(t, h * w).T[:, None, :]  # (HW, 1, T)

    def conv_same(kernel):
        k = kernel.shape[0]
        # np.convolve 'same' flips the kernel; XLA conv is correlation.
        rhs = jnp.asarray(np.ascontiguousarray(kernel[::-1])).reshape(1, 1, k)
        # np.convolve 'same' keeps full[i + (K-1)//2]; in correlation form
        # with the reversed kernel that is a left pad of ceil((K-1)/2).
        pad_lo = k // 2
        out = jax.lax.conv_general_dilated(
            sig.astype(jnp.float32), rhs,
            window_strides=(1,),
            padding=[(pad_lo, k - 1 - pad_lo)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return out[:, 0, :].T.reshape(t, h, w)

    return conv_same(cos_k), conv_same(sin_k)
