"""Is the table-path SHT WRONG on TPU at nside 512 (4.3 GB table >
2^31 bytes)? Compare one synthesis: TPU-table vs TPU-OTF vs CPU-table.
"""
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
import sys
nside = int(sys.argv[1]) if len(sys.argv) > 1 else 512
lmax = 2 * nside

with jax.default_device(cpu):
    from commander_tpu.sphere import sht
    from commander_tpu.utils import transfer
    nl = lmax + 1
    rng = np.random.default_rng(0)
    a = (rng.standard_normal((1, nl, nl))
         + 1j * rng.standard_normal((1, nl, nl))).astype(np.complex64)
    a *= np.tril(np.ones((nl, nl))).T[None]
    a[..., 0] = a[..., 0].real
    plan_t = sht.get_plan(nside, lmax, dtype="float32", tables=True)
    plan_o = sht.get_plan(nside, lmax, dtype="float32", tables=False,
                          legendre_backend="xla")
    # CPU reference via the table plan
    m_cpu = np.asarray(sht.alm2map(plan_t, jnp.asarray(a)))
    spec_t, enc_t = transfer.encode((plan_t, jnp.asarray(a)))
    spec_o, enc_o = transfer.encode((plan_o, jnp.asarray(a)))


@jax.jit
def synth_t(e):
    p, a = transfer.decode(spec_t, e)
    return sht.alm2map(p, a)


@jax.jit
def synth_o(e):
    p, a = transfer.decode(spec_o, e)
    return sht.alm2map(p, a)


m_t = np.asarray(synth_t(jax.device_put(enc_t, dev)))
m_o = np.asarray(synth_o(jax.device_put(enc_o, dev)))
nrm = np.sqrt(np.mean(m_cpu ** 2))
print(f"nside {nside}: |cpu| rms {nrm:.4e}")
print(f"TPU-table vs CPU rms err: "
      f"{np.sqrt(np.mean((m_t - m_cpu) ** 2)) / nrm:.3e}")
print(f"TPU-OTF   vs CPU rms err: "
      f"{np.sqrt(np.mean((m_o - m_cpu) ** 2)) / nrm:.3e}")
print(f"TPU-table vs TPU-OTF rms: "
      f"{np.sqrt(np.mean((m_t - m_o) ** 2)) / nrm:.3e}")
