import numpy as np
import pytest

from swiftllm_tpu.worker.block_manager import BlockManager


def make_mgr(num_blocks=8, block_size=4, max_seqs=4, max_blocks_per_seq=8):
    return BlockManager("hbm", num_blocks, block_size, max_seqs, max_blocks_per_seq)


def test_alloc_grow_and_free():
    m = make_mgr()
    m.allocate_for_seq(0, 5)          # needs 2 pages
    assert m.get_num_allocated_blocks(0) == 2
    assert m.num_free_blocks == 6
    m.allocate_for_seq(0, 6)          # still 2 pages
    assert m.get_num_allocated_blocks(0) == 2
    m.allocate_for_seq(0, 9)          # grows to 3
    assert m.get_num_allocated_blocks(0) == 3
    ids = m.free_seq(0)
    assert len(ids) == 3
    assert m.num_free_blocks == 8


def test_out_of_blocks_raises():
    m = make_mgr(num_blocks=2)
    m.allocate_for_seq(0, 8)
    with pytest.raises(RuntimeError, match="out of KV pages"):
        m.allocate_for_seq(1, 1)


def test_blocks_unique_across_seqs():
    m = make_mgr()
    m.allocate_for_seq(0, 16)
    m.allocate_for_seq(1, 16)
    a = set(m.seq_block_ids(0).tolist())
    b = set(m.seq_block_ids(1).tolist())
    assert not (a & b)
    assert len(a) == len(b) == 4


def test_gather_and_free_then_fresh_alloc():
    m = make_mgr()
    m.allocate_for_seq(2, 10)
    pages = m.gather_and_free(2)
    assert len(pages) == 3
    fresh = m.allocate_fresh_for_seq(2, 10)
    assert len(fresh) == 3
    assert m.num_free_blocks == 5


def test_table_is_dense_int32():
    m = make_mgr()
    m.allocate_for_seq(1, 7)
    assert m.block_table.dtype == np.int32
    assert m.block_table.shape == (4, 8)
