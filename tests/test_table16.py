"""Table16 SHA-256 chip: full two-block hash through the spread-table
chip, MockProver-checked at K=17 (the 2^16-row lookup table needs it).

Reference: halo2_gadgets/src/sha256/table16/compression.rs:951-1003
(k=17 test). NOTE the reference gadget semantics: `Table16Chip` omits
the FIPS per-block feed-forward — its own test asserts
`digest[i] + IV[i] == COMPRESSION_OUTPUT[i]` — so the `Sha256`
streaming wrapper over Table16 computes *iterated raw compression
rounds*, not FIPS SHA-256. We mirror that behavior exactly; the oracle
here is the raw-rounds host function, tied back to FIPS via the
single-block identity raw("abc") + IV == sha256("abc").
"""
import struct

from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.gadgets.sha256 import (BlockWord, IV, ROUND_CONSTANTS,
                                      Sha256, _rotr, sha256_host)
from halo2_tpu.gadgets.sha256.table16 import (Table16Chip, get_tag,
                                              spread_int, even_bits_int,
                                              odd_bits_int,
                                              negate_spread_int)

K = 17
INPUT_WORD = 0b01111000100000000000000000000000


def compress_rounds_only(state, block):
    """64 SHA-256 rounds WITHOUT the final feed-forward add — the
    function Table16 actually proves (see module docstring)."""
    w = list(block) + [0] * 48
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w[i] = (w[i - 16] + s0 + w[i - 7] + s1) & 0xFFFFFFFF
    a, b, c, d, e, f, g, h = state
    for i in range(64):
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (h + S1 + ch + ROUND_CONSTANTS[i] + w[i]) & 0xFFFFFFFF
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & 0xFFFFFFFF
        h, g, f, e, d, c, b, a = (g, f, e, (d + t1) & 0xFFFFFFFF, c, b,
                                  a, (t1 + t2) & 0xFFFFFFFF)
    return [a, b, c, d, e, f, g, h]


class Sha256Circuit(Circuit):
    def without_witnesses(self):
        return Sha256Circuit()

    @classmethod
    def configure(cls, meta):
        return Table16Chip.configure(meta)

    def synthesize(self, config, layouter):
        Table16Chip.load(config, layouter)
        chip = Table16Chip(config)
        sha = Sha256(chip, layouter)
        sha.update([BlockWord(Value.known(INPUT_WORD))] * 16)
        self.digest_out = [w.value.inner() for w in sha.finalize()]


def test_table16_helpers():
    assert get_tag(0) == 0 and get_tag((1 << 7) - 1) == 0
    assert get_tag(1 << 7) == 1 and get_tag(1 << 13) == 4
    assert get_tag(0xFFFF) == 5
    assert spread_int(0b1011, 4) == 0b01000101
    assert even_bits_int(0b01000101, 4) == 0b1011
    assert odd_bits_int(0b01000101, 4) == 0b0000
    # spread-space negation flips only the even (data) bit plane
    assert negate_spread_int(spread_int(0b1010, 4), 8) == spread_int(
        0b0101, 4)


def test_raw_rounds_ties_to_fips():
    """raw("abc" block) + IV == sha256(b"abc"): the identity the
    reference's compression test pins (COMPRESSION_OUTPUT)."""
    data = b"abc" + b"\x80" + b"\x00" * 52 + struct.pack(">Q", 24)
    block = list(struct.unpack(">16I", data))
    raw = compress_rounds_only(list(IV), block)
    fips = struct.unpack(">8I", sha256_host(b"abc"))
    assert [(r + iv) & 0xFFFFFFFF for r, iv in zip(raw, IV)] == list(fips)


class BenchSha256Circuit(Circuit):
    """The reference bench preimage (halo2_gadgets/benches/sha256.rs:
    31 words): the FIPS-padded message spans 2 blocks inside finalize,
    exercising the re-initialization between consecutive finalize
    compressions."""

    def without_witnesses(self):
        return BenchSha256Circuit()

    @classmethod
    def configure(cls, meta):
        return Table16Chip.configure(meta)

    def synthesize(self, config, layouter):
        Table16Chip.load(config, layouter)
        chip = Table16Chip(config)
        sha = Sha256(chip, layouter)
        sha.update([BlockWord(Value.known(0b01111000))] * 31)
        self.digest_out = [w.value.inner() for w in sha.finalize()]


def test_table16_bench_preimage_digest():
    """Regression: finalize over >1 block crashed (post-compress state
    has no decomposed pieces). Expected digest follows the chip's
    chained-rounds semantics (initialization_with_state re-decomposes
    the raw round output without the FIPS feed-forward addition — the
    reference's unstable-sha256-gadget quirk, sha256.rs:115-123).
    Full MockProver.verify() of a second k=17 circuit is skipped to
    keep suite time bounded — gates are identical to the two-block
    test."""
    circuit = BenchSha256Circuit()
    MockProver.run(K, circuit, [])  # full synthesis at k=17
    msg = [0b01111000] * 31
    length = 31 * 32
    pad = [0x80000000] + [0] * 14 + [length >> 32, length & 0xFFFFFFFF]
    words = msg + pad  # 48 words = 3 blocks
    assert len(words) == 48
    state = list(IV)
    for i in range(0, 48, 16):
        state = compress_rounds_only(state, words[i:i + 16])
    assert circuit.digest_out == state


def test_table16_sha256_two_blocks():
    pad = [0x80000000] + [0] * 13 + [0, 512]  # FIPS framing, 512-bit msg
    state = compress_rounds_only(list(IV), [INPUT_WORD] * 16)
    expected = compress_rounds_only(state, pad)
    circuit = Sha256Circuit()
    prover = MockProver.run(K, circuit, [])
    assert circuit.digest_out == expected
    assert prover.verify() == []
