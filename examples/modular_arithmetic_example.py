"""Modular arithmetic helpers: modpow, primitive roots, totient, factors
(reference modular_arithmetic_example.c / math_primitive_root_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from liquid_dsp_tpu.design.special import (
    modpow, primitive_root_prime, totient, factor, unique_factor, is_prime)

n = 280
print(f"factor({n})        = {factor(n)}")
print(f"unique_factor({n}) = {unique_factor(n)}")
print(f"totient({n})       = {totient(n)}")

# primitive roots of small primes: g generates the full multiplicative group
for p in (5, 7, 11, 13, 17, 23):
    g = primitive_root_prime(p)
    orbit = [modpow(g, k, p) for k in range(1, p)]
    assert sorted(orbit) == list(range(1, p))
    print(f"primitive root of {p:2d}: {g}  (g^k mod p = {orbit})")

# modpow on a big exponent, plus a Fermat primality-style check
p = 509  # a prime the FFT module's Bluestein path handles
assert is_prime(p) and modpow(3, p - 1, p) == 1
print(f"3^{p - 1} mod {p} = 1 (Fermat check on prime {p})")
