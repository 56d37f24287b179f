"""Fuzz/robustness tests for the from-scratch LMDB codec.

The reader is load-bearing for the FileClient lmdb backend
(/root/reference/Train/basicsr/utils/file_client.py:20-90 is the behavior
contract), and it parses an untrusted binary format — every malformed
input (truncation, corrupted page headers, bogus child pointers, cycles,
oversized depth, overflow chains past EOF) must raise the typed
``LmdbError`` (a ValueError), never a bare struct.error/IndexError, an
out-of-control loop, or a silent wrong answer pulled from garbage offsets.
"""

import os
import struct

import numpy as np
import pytest

from rethink_acoustic_image_enhancement_tpu.data.lmdb_codec import (
    PAGE_SIZE,
    LmdbError,
    LmdbReader,
    write_lmdb,
)


def _make_env(tmp_path, n=40, big=True):
    """A valid env exercising leaves, at least one branch level, and
    overflow (F_BIGDATA) chains."""
    rng = np.random.default_rng(0)
    items = {}
    for i in range(n):
        val = rng.integers(0, 256, size=int(rng.integers(10, 600)),
                           dtype=np.uint8).tobytes()
        items[f"key_{i:04d}"] = val
    if big:
        items["zz_big"] = bytes(rng.integers(0, 256, size=3 * PAGE_SIZE,
                                             dtype=np.uint8))
    path = str(tmp_path / "fuzz.lmdb")
    write_lmdb(path, sorted(items.items()))
    return path, items


def _raw(path):
    with open(os.path.join(path, "data.mdb"), "rb") as f:
        return bytearray(f.read())


def _write(path, buf):
    with open(os.path.join(path, "data.mdb"), "wb") as f:
        f.write(bytes(buf))


def _drain(reader, limit=10_000_000):
    """Exercise every read path; bounded so a termination bug fails the
    test instead of hanging it."""
    count = 0
    for k, v in reader.items():
        assert isinstance(v, (bytes, bytearray))
        count += 1
        if count > limit:
            raise AssertionError("items() did not terminate")
    reader.get(b"key_0000")
    reader.get(b"definitely-missing")
    return count


def test_valid_env_round_trips(tmp_path):
    path, items = _make_env(tmp_path)
    r = LmdbReader(path)
    assert {k.decode(): v for k, v in r.items()} == items
    assert r.get("zz_big") == items["zz_big"]


@pytest.mark.parametrize("size", [0, 10, 100, PAGE_SIZE, 2 * PAGE_SIZE - 1])
def test_truncated_below_metas_raises(tmp_path, size):
    path, _ = _make_env(tmp_path, n=8, big=False)
    buf = _raw(path)
    _write(path, buf[:size])
    with pytest.raises(LmdbError):
        LmdbReader(path)


def test_truncated_data_pages_raise_not_crash(tmp_path):
    """Metas intact but the tree cut off: constructing may already raise
    (root beyond EOF); any read must raise LmdbError, not struct.error."""
    path, _ = _make_env(tmp_path)
    buf = _raw(path)
    for keep_pages in (2, 3, 5):
        _write(path, buf[:keep_pages * PAGE_SIZE])
        try:
            r = LmdbReader(path)
            with pytest.raises(LmdbError):
                _drain(r)
        except LmdbError:
            pass


def test_bad_magic_raises(tmp_path):
    path, _ = _make_env(tmp_path, n=4, big=False)
    buf = _raw(path)
    struct.pack_into("<I", buf, 16, 0xDEADBEEF)
    _write(path, buf)
    with pytest.raises(LmdbError, match="not an LMDB"):
        LmdbReader(path)


def test_bad_version_raises(tmp_path):
    path, _ = _make_env(tmp_path, n=4, big=False)
    buf = _raw(path)
    struct.pack_into("<I", buf, 16 + 4, 99)
    _write(path, buf)
    with pytest.raises(LmdbError, match="version"):
        LmdbReader(path)


def test_bogus_page_size_raises(tmp_path):
    path, _ = _make_env(tmp_path, n=4, big=False)
    buf = _raw(path)
    # free-DB slot md_pad (page size) lives at meta offset +24 in BOTH metas
    for meta_base in (0, PAGE_SIZE):
        struct.pack_into("<I", buf, meta_base + 16 + 24, 12345)
    _write(path, buf)
    with pytest.raises(LmdbError, match="page size"):
        LmdbReader(path)


def _main_db_off(meta_base):
    # _META_ST = magic(4) version(4) addr(8) mapsize(8) db0(48) db1(48)...
    return meta_base + 16 + 4 + 4 + 8 + 8 + 48


def test_root_beyond_eof_raises(tmp_path):
    path, _ = _make_env(tmp_path, n=4, big=False)
    buf = _raw(path)
    for meta_base in (0, PAGE_SIZE):
        # main-DB root is the last u64 of the db struct
        struct.pack_into("<Q", buf, _main_db_off(meta_base) + 40, 1 << 40)
    _write(path, buf)
    with pytest.raises(LmdbError, match="root"):
        LmdbReader(path)


def test_oversized_depth_raises(tmp_path):
    path, _ = _make_env(tmp_path, n=4, big=False)
    buf = _raw(path)
    for meta_base in (0, PAGE_SIZE):
        # md_depth is the u16 at db offset +6
        struct.pack_into("<H", buf, _main_db_off(meta_base) + 6, 9999)
    _write(path, buf)
    with pytest.raises(LmdbError, match="depth"):
        LmdbReader(path)


def test_meta_flagged_root_raises_clean(tmp_path):
    """Root pointing at a meta page: unexpected flags, typed error."""
    path, _ = _make_env(tmp_path, n=4, big=False)
    buf = _raw(path)
    for meta_base in (0, PAGE_SIZE):
        struct.pack_into("<Q", buf, _main_db_off(meta_base) + 40, 0)
    _write(path, buf)
    r = LmdbReader(path)
    with pytest.raises(LmdbError):
        r.get(b"key_0000")
    with pytest.raises(LmdbError):
        _drain(r)


def _find_branch_page(buf):
    npages = len(buf) // PAGE_SIZE
    for pg in range(2, npages):
        flags = struct.unpack_from("<H", buf, pg * PAGE_SIZE + 10)[0]
        if flags == 0x01:  # P_BRANCH
            return pg
    return None


def test_branch_cycle_terminates_with_error(tmp_path):
    """Every branch child pointer redirected to the branch itself — both
    descent (get) and DFS (items) must detect the cycle, not hang."""
    path, _ = _make_env(tmp_path, n=400, big=False)
    buf = _raw(path)
    pg = _find_branch_page(buf)
    assert pg is not None, "fixture should have produced a branch level"
    off = pg * PAGE_SIZE
    lower = struct.unpack_from("<H", buf, off + 12)[0]
    n = (lower - 16) >> 1
    for i in range(n):
        ptr = struct.unpack_from("<H", buf, off + 16 + 2 * i)[0]
        # child pgno = node lo|hi<<16|flags<<32 -> point it back at pg
        struct.pack_into("<HHH", buf, off + ptr,
                         pg & 0xFFFF, (pg >> 16) & 0xFFFF, 0)
    _write(path, buf)
    r = LmdbReader(path)
    with pytest.raises(LmdbError):
        r.get(b"key_0000")
    with pytest.raises(LmdbError):
        _drain(r)


def test_corrupt_node_pointers_raise(tmp_path):
    """Node-pointer table of the root page smashed with out-of-page
    offsets."""
    path, _ = _make_env(tmp_path, n=8, big=False)
    buf = _raw(path)
    root_off = 2 * PAGE_SIZE  # tiny env: root is the first data page
    for i in range(4):
        struct.pack_into("<H", buf, root_off + 16 + 2 * i, 0xFFF0)
    _write(path, buf)
    r = LmdbReader(path)
    with pytest.raises(LmdbError):
        r.get(b"key_0000")


def test_overflow_pointer_beyond_eof(tmp_path):
    """F_BIGDATA node whose overflow pgno points past the file."""
    path, items = _make_env(tmp_path, n=2, big=True)
    buf = _raw(path)
    # find the leaf node with F_BIGDATA (flags bit 0x01 in node header)
    npages = len(buf) // PAGE_SIZE
    patched = False
    for pg in range(2, npages):
        off = pg * PAGE_SIZE
        flags = struct.unpack_from("<H", buf, off + 10)[0]
        if flags != 0x02:  # P_LEAF
            continue
        lower = struct.unpack_from("<H", buf, off + 12)[0]
        for i in range((lower - 16) >> 1):
            ptr = struct.unpack_from("<H", buf, off + 16 + 2 * i)[0]
            nlo, nhi, nfl, ksz = struct.unpack_from("<HHHH", buf, off + ptr)
            if nfl & 0x01:
                struct.pack_into("<Q", buf, off + ptr + 8 + ksz, 1 << 40)
                patched = True
    assert patched
    _write(path, buf)
    r = LmdbReader(path)
    with pytest.raises(LmdbError):
        r.get(b"zz_big")
    with pytest.raises(LmdbError):
        _drain(r)


def test_random_byte_flips_never_crash_or_hang(tmp_path):
    """Seeded random single/multi-byte corruptions anywhere in the file:
    every outcome must be success or LmdbError — no other exception type
    escapes, and all walks terminate."""
    path, _ = _make_env(tmp_path, n=60, big=True)
    clean = bytes(_raw(path))
    rng = np.random.default_rng(1234)
    for trial in range(200):
        buf = bytearray(clean)
        for _ in range(int(rng.integers(1, 9))):
            pos = int(rng.integers(0, len(buf)))
            buf[pos] = int(rng.integers(0, 256))
        _write(path, buf)
        try:
            r = LmdbReader(path)
            _drain(r)
        except LmdbError:
            pass
        # anything else (struct.error, IndexError, RecursionError,
        # MemoryError...) propagates and fails the test


def test_truncation_sweep_never_crash_or_hang(tmp_path):
    path, _ = _make_env(tmp_path, n=60, big=True)
    clean = bytes(_raw(path))
    rng = np.random.default_rng(99)
    sizes = sorted(int(rng.integers(0, len(clean))) for _ in range(40))
    for size in sizes:
        _write(path, clean[:size])
        try:
            r = LmdbReader(path)
            _drain(r)
        except LmdbError:
            pass
