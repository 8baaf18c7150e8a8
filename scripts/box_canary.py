"""Fixed CPU-work canary to normalize bench numbers across host-noise
epochs: single-core Python loop + 8-way parallel md5 burst. Print
seconds; larger = slower box. r13 finding: the sandbox host drifts
2x within hours, so only interleaved A/Bs or canary-normalized
numbers are comparable."""
import hashlib, time
from concurrent.futures import ProcessPoolExecutor

def _md5_burst(_):
    h = b"x" * 4096
    for _ in range(20000):
        h = hashlib.md5(h).digest() + h[:4080]
    return h[0]

def main():
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i ^ (i >> 3)
    t_single = time.perf_counter() - t0
    t0 = time.perf_counter()
    with ProcessPoolExecutor(8) as ex:
        list(ex.map(_md5_burst, range(8)))
    t_par = time.perf_counter() - t0
    print(f"single={t_single:.3f}s parallel8={t_par:.3f}s")

if __name__ == "__main__":
    main()
