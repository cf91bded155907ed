import numpy as np

from kmcp_spark.functions.hashing import derive_seeds, hash_bytes_rolling, splitmix64


def test_splitmix64_deterministic_and_seeded():
    x = np.arange(1000, dtype=np.uint64)
    a, b = splitmix64(x), splitmix64(x)
    assert (a == b).all()
    c = splitmix64(x, seed=1)
    assert (a != c).mean() > 0.99


def test_splitmix64_bit_balance():
    h = splitmix64(np.arange(4096, dtype=np.uint64))
    bits = np.unpackbits(h.view(np.uint8)).mean()
    assert abs(bits - 0.5) < 0.02


def test_rolling_hash_window_property():
    buf = np.frombuffer(b"abcdefabcdef", dtype=np.uint8)
    h = hash_bytes_rolling(buf, 4)
    assert h.shape[0] == 9
    # identical windows hash identically ("abcd" at 0 and 6)
    assert h[0] == h[6]
    # different windows differ
    assert h[0] != h[1]


def test_rolling_hash_short_input():
    assert hash_bytes_rolling(np.arange(3, dtype=np.uint64), 5).shape[0] == 0


def test_derive_seeds_unique():
    s = derive_seeds(256)
    assert len(np.unique(s)) == 256
