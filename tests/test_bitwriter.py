"""Bit-writer unit tests: hand-computed bit patterns for every JXL
primitive coding (parity targets cited from reference bitwriter.c)."""

import pytest

from hydrium_tpu.jxl.bitwriter import BitWriter, U32Table, ENUM_TABLE


def bits_of(data: bytes, nbits: int) -> str:
    """LSB-first bit string of the first nbits bits."""
    out = []
    for i in range(nbits):
        out.append(str((data[i // 8] >> (i % 8)) & 1))
    return "".join(out)


def test_lsb_first_packing():
    bw = BitWriter()
    bw.write(0b1, 1)
    bw.write(0b10, 2)
    bw.write(0b11111, 5)
    data = bw.finalize()
    # bits: 1, then 0,1, then 1,1,1,1,1 -> byte 0b11111101
    assert data == bytes([0b11111101])


def test_write_masks_value():
    bw = BitWriter()
    bw.write(0xFFFF, 4)  # only low 4 bits taken
    bw.write(0, 4)
    assert bw.finalize() == bytes([0x0F])


def test_long_values():
    bw = BitWriter()
    bw.write(0x0123456789ABCD, 56)
    data = bw.finalize()
    assert data == bytes([0xCD, 0xAB, 0x89, 0x67, 0x45, 0x23, 0x01])


def test_zero_pad():
    bw = BitWriter()
    bw.write(1, 3)
    bw.zero_pad()
    assert bw.bit_position == 8
    bw.zero_pad()
    assert bw.bit_position == 8
    assert bw.finalize() == bytes([1])


def test_u32_coding():
    # size_header table from encoder.c:98-101
    table = U32Table(cpos=(1, 1, 1, 1), upos=(9, 13, 18, 30))
    bw = BitWriter()
    bw.write_u32(table, 256)  # fits selector 0: (256-1)<<2 | 0 in 11 bits
    data = bw.finalize()
    assert bits_of(data, 11) == (
        "00" + format(255, "09b")[::-1])


def test_u32_selector_progression():
    table = U32Table(cpos=(0, 256, 2304, 18688), upos=(8, 11, 14, 30))
    for value, sel in ((0, 0), (255, 0), (256, 1), (2303, 1), (2304, 2),
                       (18687, 2), (18688, 3)):
        bw = BitWriter()
        bw.write_u32(table, value)
        data = bw.finalize()
        assert (data[0] & 3) == sel, (value, sel)


def test_enum_coding():
    # enum 0 -> selector 0, no extra bits: 2 bits total
    bw = BitWriter()
    bw.write_enum(0)
    assert bw.bit_position == 2
    bw2 = BitWriter()
    bw2.write_enum(5)  # cpos 2, upos 4 -> selector 2, 6 bits total
    assert bw2.bit_position == 6
    assert bw2.finalize()[0] & 3 == 2


@pytest.mark.parametrize(
    "value,nbits",
    [(0, 2), (1, 6), (16, 6), (17, 10), (272, 10), (273, 15),
     (1 << 12, 24), (1 << 20, 33)],
)
def test_u64_bit_lengths(value, nbits):
    bw = BitWriter()
    bw.write_u64(value)
    assert bw.bit_position == nbits


def test_u64_zero_and_small():
    bw = BitWriter()
    bw.write_u64(0)
    assert bw.finalize() == bytes([0])
    bw = BitWriter()
    bw.write_u64(5)  # ((5-1)<<2)|1 = 17 in 6 bits
    assert bw.finalize() == bytes([17])


def test_icc_varint():
    bw = BitWriter()
    bw.write_icc_varint(0)
    bw.write_icc_varint(127)
    bw.write_icc_varint(128)
    bw.write_icc_varint(300)
    data = bw.finalize()
    assert data == bytes([0x00, 0x7F, 0x80, 0x01, 0xAC, 0x02])


def test_append_writer_unaligned():
    a = BitWriter()
    a.write(0b101, 3)
    b = BitWriter()
    b.write(0xAB, 8)
    b.write(0b1, 1)
    a.append_writer(b)
    assert a.bit_position == 12
    data = a.finalize()
    # 101 then 11010101 then 1 -> bits: 1,0,1,1,1,0,1,0 | 1,0,1,1
    val = data[0] | (data[1] << 8)
    expect = 0b101 | (0xAB << 3) | (1 << 11)
    assert val == expect
