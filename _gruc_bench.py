import numpy as np, jax, jax.numpy as jnp
from pytorch_kaldi_cgs_tpu.models import GRU_cudnn
from pytorch_kaldi_cgs_tpu.utils.timing import device_loop_time

T, B, F, H = 300, 16, 143, 512
def build(f):
    return GRU_cudnn({"to_do":"train","arch_name":"t","out_folder":"/tmp",
        "hidden_size":str(H),"num_layers":"2","bias":"True",
        "bidirectional":"False","dropout":"0.0",
        "fused_scan":"True" if f else "False"}, F)
fused, plain = build(True), build(False)
v = jax.device_put(fused.init(0))
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (T, B, F), jnp.float32)
for name, net, force in (("scan", plain, False), ("fused", fused, True)):
    # plain must not auto-upgrade: on TPU backend _fused_capable is True
    # regardless of the option, so monkey-set eligibility through options
    if not force:
        net._fused_capable = lambda B_, H_: False
    def body(c, net=net):
        y, _ = net.apply(v, c, train=False)
        return c + jnp.sum(y * y, axis=2, keepdims=True) * 1e-9
    t = device_loop_time(body, x, n_lo=2, n_hi=8)
    print("%s: %.3f ms" % (name, t*1e3))
