"""Is jax.device_put async through the axon relay, and does it overlap compute?

Times (a) device_put call-return vs block_until_ready for a ~165 MB host
array (the chunk_size=40 offloaded caption chunk), (b) a compute program
alone, (c) dispatch-compute-then-put vs put-then-block — to decide whether
main-thread prefetch of the next caption chunk can hide the H2D transfer
(pipeline/memory_update.py) without the worker thread that regressed run B3.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu"

host = np.random.randn(40, 576, 3584).astype(np.float32).astype(jnp.bfloat16)
print(json.dumps({"bytes_mb": round(host.nbytes / 1e6, 1)}), flush=True)

# Warm-up put (compile/handshake)
x = jax.device_put(host)
jax.block_until_ready(x)
del x

for i in range(3):
    t0 = time.time()
    x = jax.device_put(host)
    t1 = time.time()
    jax.block_until_ready(x)
    t2 = time.time()
    print(json.dumps({"put_call_s": round(t1 - t0, 3),
                      "put_block_s": round(t2 - t1, 3)}), flush=True)
    del x

# Compute program ~2s: chained matmuls
a = jax.device_put(np.random.randn(4096, 4096).astype(np.float32).astype(jnp.bfloat16))

@jax.jit
def work(a, n):
    def body(_, x):
        return jnp.tanh(x @ a) * 0.999
    return jax.lax.fori_loop(0, n, body, a)[0, 0]

n = 600
r = work(a, n); float(r)  # compile
t0 = time.time(); r = work(a, n); float(r); t_work = time.time() - t0
print(json.dumps({"work_s": round(t_work, 3)}), flush=True)

# Overlap test: dispatch work, then put, then block both.
for i in range(3):
    t0 = time.time()
    r = work(a, n)
    t1 = time.time()
    x = jax.device_put(host)
    t2 = time.time()
    jax.block_until_ready(x)
    t3 = time.time()
    float(r)
    t4 = time.time()
    print(json.dumps({"dispatch_s": round(t1 - t0, 3),
                      "put_call_s": round(t2 - t1, 3),
                      "put_block_s": round(t3 - t2, 3),
                      "work_drain_s": round(t4 - t3, 3),
                      "total_s": round(t4 - t0, 3),
                      "serial_would_be_s": round(t_work + 2.0, 3)}), flush=True)
    del x
print("DONE", flush=True)
