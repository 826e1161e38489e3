"""BrailleBlockPunchCards port (functions/bbpc.py) — the GUI's
per-result positions string (BrailleBlockPunchCards.java:8-52,
SearchOperator.createDetails:252 printBits(mask, 64))."""

from marginaliasearch_ray.functions.bbpc import _bin2brail, print_bits


def test_dot_shuffle_vectors():
    # native bit -> braille dot (0..7 -> 0,1,2,6,3,4,5,7): bit b maps to
    # dot value 2^d per the reference's transformation table
    expected_dot = {0: 0, 1: 1, 2: 2, 3: 6, 4: 3, 5: 4, 6: 5, 7: 7}
    for b, d in expected_dot.items():
        assert _bin2brail(1 << b) == 1 << d
    assert _bin2brail(0x00) == 0x00
    assert _bin2brail(0xFF) == 0xFF  # full byte is a fixed point


def test_print_bits_shape_and_order():
    s = print_bits(0, 64)
    assert s == "⠀" * 8
    # LSB-first: bit 0 lands in the FIRST char, bit 63 in the last
    assert print_bits(1, 64)[0] != "⠀"
    assert print_bits(1, 64)[1:] == "⠀" * 7
    hi = print_bits(1 << 63, 64)
    assert hi[:7] == "⠀" * 7 and hi[7] == chr(0x2800 + 0x80)


def test_bit_count_preserved():
    for v in (0x1234_5678_9ABC_DEF0, (1 << 64) - 1, 0x8000_0000_0000_0001):
        s = print_bits(v, 64)
        dots = sum(bin(ord(c) - 0x2800).count("1") for c in s)
        assert dots == bin(v & ((1 << 64) - 1)).count("1")


def test_negative_mask_is_unsigned():
    # the engine's positions_mask is int64; Java >>> treats it unsigned
    assert print_bits(-1, 64) == print_bits((1 << 64) - 1, 64)


def test_matches_sql_twin():
    import duckdb

    import __ray_entry__ as E

    masks = [0, 1, 255, 1 << 63, 0x1234_5678_9ABC_DEF0, (1 << 64) - 1 - 7]
    con = duckdb.connect()
    for m in masks:
        signed = m - (1 << 64) if m >= (1 << 63) else m
        sql = E._braille_sql(
            f"SELECT 1 AS doc_id, 0.0 AS score_r,"
            f" CAST({signed} AS BIGINT) AS positions_mask"
        )
        got = con.execute(sql).fetchone()[-1]
        assert got == print_bits(m, 64), hex(m)
