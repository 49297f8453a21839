"""Legacy ``torch.rfft``/``torch.ifft`` shim for running the reference model.

The reference LCT calls the torch-1.7 stacked-real/imag FFT API
(`/root/reference/models/feature_propagation.py:228,235`):

    datafre = torch.rfft(datapad, 3, onesided=False)   # (..., 2) re/im
    re      = torch.ifft(refre, 3)                     # (..., 2) -> (..., 2)

That API was removed in torch 1.8; the installed torch 2.x only has the
``torch.fft`` module.  ``install()`` maps the two legacy entry points onto
``torch.fft.fftn``/``rfftn``/``ifftn`` so the composed reference
``NlosPose.forward`` (`/root/reference/models/NlosPose.py:49-59`) can run
unmodified — which is what makes end-to-end numeric parity a measurement
instead of an inference (tests/test_torch_import.py::test_full_forward_parity).

Legacy semantics implemented (torch-1.7 docs):
* ``rfft(x, n, normalized=False, onesided=True)``: FFT over the LAST ``n``
  dims of a real tensor; result has a trailing size-2 real/imag axis.
  ``onesided=True`` keeps only the non-redundant half of the last signal
  dim (``rfftn``); ``normalized=True`` scales by 1/sqrt(N) ("ortho").
* ``ifft(x, n, normalized=False)``: inverse complex FFT over the last
  ``n`` signal dims of a stacked ``(..., 2)`` tensor, returning the same
  stacked layout; unnormalized mode divides by N ("backward" norm).
"""

from __future__ import annotations


def _dims(signal_ndim: int):
    return tuple(range(-signal_ndim, 0))


def install() -> None:
    """Idempotently add ``torch.rfft`` / ``torch.ifft`` if absent."""
    import torch

    if hasattr(torch, "rfft") and hasattr(torch, "ifft"):
        return

    def rfft(input, signal_ndim, normalized=False, onesided=True):
        norm = "ortho" if normalized else "backward"
        if onesided:
            out = torch.fft.rfftn(input, dim=_dims(signal_ndim), norm=norm)
        else:
            out = torch.fft.fftn(input, dim=_dims(signal_ndim), norm=norm)
        return torch.view_as_real(out)

    def ifft(input, signal_ndim, normalized=False):
        norm = "ortho" if normalized else "backward"
        # Stacked (..., 2) layout: the signal dims are the signal_ndim axes
        # BEFORE the trailing real/imag axis.
        x = torch.view_as_complex(input.contiguous())
        out = torch.fft.ifftn(x, dim=_dims(signal_ndim), norm=norm)
        return torch.view_as_real(out)

    torch.rfft = rfft
    torch.ifft = ifft
