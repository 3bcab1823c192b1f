"""Probe axon-relay host->device transfer characteristics."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(x)


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    for mb in (2, 8, 50):
        a = np.random.randint(0, 255, (mb * 1024 * 1024,), np.uint8)
        jnp.asarray(a)  # warm path
        t0 = time.perf_counter()
        x = jnp.asarray(a)
        t_disp = time.perf_counter() - t0
        sync(x[0])
        t_all = time.perf_counter() - t0
        print(f"upload {mb:3d}MB: dispatch {t_disp*1e3:7.1f} ms, "
              f"synced {t_all*1e3:7.1f} ms -> {mb/t_all:6.1f} MB/s", flush=True)

    # does upload overlap with compute?
    @jax.jit
    def heavy(x):
        def body(c, _):
            return c @ c * 0.999, 0.0
        y, _ = jax.lax.scan(body, x, None, length=60)
        return y[0, 0]

    x0 = jnp.asarray(np.random.randn(2048, 2048).astype(np.float32))
    sync(heavy(x0))
    t0 = time.perf_counter()
    r = heavy(x0)
    sync(r)
    t_compute = time.perf_counter() - t0
    print(f"heavy compute alone: {t_compute*1e3:7.1f} ms", flush=True)

    big = np.random.randint(0, 255, (50 * 1024 * 1024,), np.uint8)
    t0 = time.perf_counter()
    r = heavy(x0)           # dispatch compute first
    up = jnp.asarray(big)   # then upload while computing
    sync(r)
    sync(up[0])
    t_both = time.perf_counter() - t0
    print(f"compute + 50MB upload together: {t_both*1e3:7.1f} ms "
          f"(sum would be ~{t_compute*1e3 + 890:.0f} ms)", flush=True)

    # device_put with donation/async explicitly
    t0 = time.perf_counter()
    f = jax.device_put(big, dev)
    t_disp = time.perf_counter() - t0
    sync(f[0])
    print(f"device_put 50MB: dispatch {t_disp*1e3:.1f} ms, "
          f"synced {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
