"""Bit-string chromosome encoding for genetic-algorithm search
(reference chromosome_example.c)."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
from liquid_dsp_tpu.utils.optim import Chromosome, gasearch_chromosome

# mixed-resolution traits: 4, 8, and 2 bits
c = Chromosome([4, 8, 2])
c.initf([0.25, 0.5, 1.0])
print(f"initf([0.25, 0.5, 1.0]) -> {c!r}")
print(f"  integer traits : {list(c.traits)}")
print(f"  decoded valuef : {[round(c.valuef(i), 3) for i in range(3)]}")

c.mutate(0)   # flip the MSB of trait 0
print(f"after mutate(bit 0)     -> {c!r}")

p1 = Chromosome([4, 8, 2]); p1.init([0b1111, 0xFF, 0b11])
p2 = Chromosome([4, 8, 2]); p2.init([0, 0, 0])
ch = Chromosome([4, 8, 2])
ch.crossover(p1, p2, 6)
print(f"crossover(ones, zeros, threshold=6) -> {ch!r}")

# GA over the bit-string encoding: find the peak of a 2-D utility
u = lambda ch: ((ch.valuef(0) - 0.3) ** 2 + (ch.valuef(1) - 0.6) ** 2)
best, f = gasearch_chromosome(u, [10, 10], n_iters=50, seed=2)
print(f"GA best: ({best.valuef(0):.3f}, {best.valuef(1):.3f}) "
      f"target (0.300, 0.600), utility {f:.2e}")
