"""Experiment: component timings on the 108M forward (TPU)."""
import numpy as np
import jax, jax.numpy as jnp

from nmrgnn_tpu import ModelConfig, init_params
from nmrgnn_tpu.models import gnn
from nmrgnn_tpu.data.embeddings import load_standards
from nmrgnn_tpu.data.parse import structure2graph
from nmrgnn_tpu.graph import Graph, bucket_size, pad_graph
from nmrgnn_tpu.utils.profiling import device_time
from nmrgnn_tpu.ops.rbf import rbf_expand
from nmrgnn_tpu.ops.message_passing import mp_layer

cfg32 = ModelConfig()
g = structure2graph("/root/reference/tests/108M.pdb")
g = Graph(*[jnp.asarray(a) for a in g])
g = pad_graph(g, bucket_size(g.atoms.shape[0]))
params = init_params(jax.random.PRNGKey(0), cfg32, load_standards())
N = g.atoms.shape[0]
print("N padded:", N)

def dep(x, c):
    return x + jnp.sum(c).astype(x.dtype) * 1e-30

# edge pipeline only (RBF + EdgeFC): carry [N,K,E]
mask = (g.edges > 0).astype(jnp.float32)[..., None]
def edge_pipe(c):
    e = dep(g.edges, c)
    e = rbf_expand(e, cfg32.rbf_low, cfg32.rbf_high, cfg32.edge_hidden_size) * mask
    for i, p in enumerate(params["edge_fc"]):
        last = i == len(params["edge_fc"]) - 1
        e = gnn._dense(p, e, None if last else jax.nn.softplus)
    return e * mask
te = device_time(edge_pipe, jnp.zeros((N, 16, 3)), iters=32)
print(f"edge pipeline (RBF+EdgeFC) {te*1e6:.1f} us")

# MP block only (4 layers)
efeat = jnp.full((N, 16, 3), 0.1)
def mp_block(nodes):
    for p in params["mp"]:
        nodes = mp_layer(p["w"], nodes, g.nlist, efeat, g.inv_degree) + nodes
    return nodes
tm = device_time(mp_block, jnp.ones((N, 256)), iters=32)
print(f"MP block (4 layers) {tm*1e6:.1f} us")

# single MP layer
def mp1(nodes):
    return mp_layer(params["mp"][0]["w"], nodes, g.nlist, efeat, g.inv_degree) + nodes
tm1 = device_time(mp1, jnp.ones((N, 256)), iters=32)
print(f"MP single layer {tm1*1e6:.1f} us")

# gather + K-contraction only (no MXU matmul)
def kcontract(nodes):
    gathered = jnp.take(nodes[:, :256], g.nlist, axis=0)
    h = jnp.einsum("ijn,ijl->inl", efeat, gathered)
    return jnp.concatenate([h.reshape(N, -1), nodes[:, 768:]], axis=1)
tk = device_time(kcontract, jnp.ones((N, 1024)), iters=32)
print(f"gather+K-contract only {tk*1e6:.1f} us")

# FC block + out
def fc_block(nodes):
    n = nodes
    for p in params["fc"][:-1]:
        n = gnn._dense(p, n, jax.nn.softplus) + n
    n = gnn._dense(params["fc"][-1], n, jax.nn.softplus)
    full = gnn._dense(params["out"], n)
    return nodes + jnp.sum(full, -1, keepdims=True) * 1e-30
tf_ = device_time(fc_block, jnp.ones((N, 256)), iters=32)
print(f"FC block + out {tf_*1e6:.1f} us")

print(f"sum of parts ~ {(te+tm+tf_)*1e6:.1f} us")
