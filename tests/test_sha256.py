"""SHA-256 host primitive vs hashlib (FIPS oracle for the future chip)."""
import hashlib

from halo2_tpu.gadgets.sha256 import sha256_host, compress_host, IV


def test_sha256_host_matches_hashlib():
    for msg in [b"", b"abc", b"x" * 55, b"y" * 64, b"z" * 200]:
        assert sha256_host(msg) == hashlib.sha256(msg).digest()


def test_compress_one_block():
    # "abc" padded manually
    import struct
    data = b"abc" + b"\x80" + b"\x00" * 52 + struct.pack(">Q", 24)
    block = list(struct.unpack(">16I", data))
    state = compress_host(list(IV), block)
    assert struct.pack(">8I", *state) == hashlib.sha256(b"abc").digest()
