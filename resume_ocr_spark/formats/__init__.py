"""From-scratch media/document codecs (PDF, PNG, JPEG, WAV/RAUD, MP4,
HTML, TrueType). Pure numpy/stdlib — no external decode libraries."""

from __future__ import annotations


def raise_site(exc: BaseException) -> str:
    """Innermost traceback frame of ``exc`` as ``file.py:lineno``.

    The codecs translate broad builtin exceptions (ValueError/IndexError/…)
    escaping a corrupt-stream walk into typed DecodeErrors; embedding the
    original raise site in the error payload keeps genuine decoder logic
    bugs observable in audit output instead of blending into the
    'corrupt input' population (ADVICE r3)."""
    tb = exc.__traceback__
    while tb is not None and tb.tb_next is not None:
        tb = tb.tb_next
    if tb is None:
        return "?"
    fname = tb.tb_frame.f_code.co_filename.rsplit("/", 1)[-1]
    return f"{fname}:{tb.tb_lineno}"
