"""Profile host stages of compress/decompress on CPU backend (dev scratch)."""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, time, cProfile, pstats, io, sys

from dctz_tpu import compress, decompress
from dctz_tpu.config import CodecConfig

N = 1 << 25
EB = 1e-3
CFG = CodecConfig(mode="ec", error_bound=EB, container="v2", ids_codec="device")

t = np.arange(N, dtype=np.float32)
x = (np.sin(t * np.float32(0.001)) * np.float32(40.0)
     + np.sin(t * np.float32(0.137)) * np.float32(3.0)
     + np.sin(t * np.float32(2.03)) * np.float32(0.3))
spike = np.arange(N, dtype=np.int32) % 9973 == 0
x = np.where(spike, x * np.float32(8.0), x).astype(np.float32)

t0 = time.perf_counter()
blob = compress(jax.numpy.asarray(x), config=CFG)
print(f"compress (cpu, total): {time.perf_counter()-t0:.2f} s, {len(blob)} bytes", file=sys.stderr)

from dctz_tpu.utils.timing import StageTimer

# warm
y = decompress(blob)
for _ in range(3):
    st = StageTimer()
    y = decompress(blob, timer=st)
    print({k: round(v*1e3, 2) for k, v in st.stages.items()}, file=sys.stderr)

pr = cProfile.Profile()
pr.enable()
for _ in range(3):
    decompress(blob)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
print(s.getvalue())
