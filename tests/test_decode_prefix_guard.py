"""Host-side guard for the fused decode kernel's contiguous-prefix contract.

The kernel (ops/paged_attention.py decode path) requires valid decode rows to
form a contiguous prefix of the batch; a violating batch would hang the DEVICE
(a semaphore wait nobody signals). The guard in worker/model.py converts that
into a host-side ValueError before dispatch.
"""

import types

import numpy as np
import pytest

from swiftllm_tpu.worker.batch_builder import BucketKey
from swiftllm_tpu.worker.model import _assert_decode_prefix


def _batch(q_lens, decode_row=None):
    q = np.asarray(q_lens, np.int32)
    d = (np.asarray(decode_row, bool) if decode_row is not None
         else np.ones_like(q, bool))
    return types.SimpleNamespace(q_lens=q, decode_row=d)


def _key(q_len=1, rows=8):
    return BucketKey(tokens=max(rows, 8), rows=rows, pages=4, q_len=q_len)


def test_valid_prefix_passes():
    _assert_decode_prefix(_batch([1, 1, 1, 0, 0, 0, 0, 0]), _key(), dp=1)
    _assert_decode_prefix(_batch([0] * 8), _key(), dp=1)          # empty ok
    _assert_decode_prefix(_batch([1] * 8), _key(), dp=1)          # full ok


def test_gap_raises():
    with pytest.raises(ValueError, match="contiguous prefix"):
        _assert_decode_prefix(_batch([1, 0, 1, 0, 0, 0, 0, 0]), _key(), dp=1)


def test_valid_row_after_invalid_raises():
    with pytest.raises(ValueError, match="contiguous prefix"):
        _assert_decode_prefix(_batch([0, 0, 0, 0, 0, 0, 0, 1]), _key(), dp=1)


def test_per_dp_group_checked_independently():
    # group 0 valid prefix, group 1 violates.
    q = [1, 1, 0, 0] + [0, 1, 0, 0]
    with pytest.raises(ValueError, match="dp group 1"):
        _assert_decode_prefix(_batch(q), _key(rows=4), dp=2)
    # both groups valid prefixes.
    _assert_decode_prefix(_batch([1, 0, 0, 0] + [1, 1, 0, 0]),
                          _key(rows=4), dp=2)


def test_mixed_step_checks_decode_rows_only():
    # q_len > 1: prefill rows (decode_row=False) may follow decode rows with
    # q_lens > 0 — only the decode-kind rows must form the prefix.
    q = [1, 1, 4, 4, 0, 0, 0, 0]
    dec = [True, True, False, False, False, False, False, False]
    _assert_decode_prefix(_batch(q, dec), _key(q_len=4), dp=1)
    # decode row AFTER a prefill row violates.
    q = [1, 4, 1, 0, 0, 0, 0, 0]
    dec = [True, False, True, False, False, False, False, False]
    with pytest.raises(ValueError, match="contiguous prefix"):
        _assert_decode_prefix(_batch(q, dec), _key(q_len=4), dp=1)
