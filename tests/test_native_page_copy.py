"""Native page-copy library vs numpy reference (builds the .so with g++)."""

import numpy as np
import pytest

from swiftllm_tpu.native import page_copy


def _ref_copy(dst, src, dst_pages, src_pages, slots_per_page):
    for dp, sp in zip(dst_pages, src_pages):
        dst[:, dp * slots_per_page:(dp + 1) * slots_per_page] = \
            src[:, sp * slots_per_page:(sp + 1) * slots_per_page]


@pytest.mark.parametrize("n_pages,perm", [(1, False), (7, False), (16, True)])
def test_copy_pages_matches_numpy(n_pages, perm):
    rng = np.random.default_rng(0)
    L, slots_per_page, inner = 3, 4, (2, 2, 8)
    n_src, n_dst = 32, 24
    src = rng.normal(size=(L, n_src * slots_per_page) + inner).astype(np.float32)
    dst = np.zeros((L, n_dst * slots_per_page) + inner, np.float32)
    expect = dst.copy()

    src_pages = (rng.permutation(n_src)[:n_pages] if perm
                 else np.arange(n_pages)).astype(np.int32)
    dst_pages = rng.permutation(n_dst)[:n_pages].astype(np.int32)
    page_bytes = slots_per_page * int(np.prod(inner)) * 4

    page_copy.copy_pages(dst, src, dst_pages, src_pages, page_bytes)
    _ref_copy(expect, src, dst_pages, src_pages, slots_per_page)
    np.testing.assert_array_equal(dst, expect)


def test_native_lib_builds():
    assert page_copy.is_available(), "g++ build of the native page-copy lib failed"


def test_run_coalescing_consecutive():
    # consecutive pages both sides → exercised coalescing path
    rng = np.random.default_rng(1)
    L, spp = 2, 2
    src = rng.normal(size=(L, 64 * spp, 4)).astype(np.float32)
    dst = np.zeros_like(src)
    pages = np.arange(10, 30, dtype=np.int32)
    page_bytes = spp * 4 * 4
    page_copy.copy_pages(dst, src, pages, pages, page_bytes)
    expect = np.zeros_like(src)
    _ref_copy(expect, src, pages, pages, spp)
    np.testing.assert_array_equal(dst, expect)
