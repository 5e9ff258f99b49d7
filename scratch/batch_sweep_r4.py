"""Round 4: does the pipelined SD1.5 512^2 headline rise past batch 4?
r3 said batch-4 saturates; re-check at 6/8 post-GN/FFN-kernel era."""
import sys, time
import numpy as np
from lightdiffusion_tpu.runtime.cache import enable_compilation_cache
enable_compilation_cache()
import jax
from lightdiffusion_tpu.loader.checkpoint import init_random
from lightdiffusion_tpu.pipelines.sd import SDPipeline
from lightdiffusion_tpu.ops import layers as L

def log(*a): print(*a, file=sys.stderr, flush=True)

pipe = SDPipeline(init_random(jax.random.PRNGKey(0)), policy=L.BF16, clip_skip=-2)
kw = dict(steps=20, cfg=7.0, sampler_name="euler_ancestral", scheduler="karras")
pos = pipe.encode_text("masterpiece, best quality, a cat on a mat")
neg = pipe.encode_text("blurry, low quality")

for batch in (4, 6, 8):
    latent = pipe.empty_latent(512, 512, batch)
    def run(seed):
        return pipe.decode(pipe.sample_latent(latent, pos, neg, seed=seed, **kw))
    t0 = time.time()
    img = run(0); float(np.asarray(img.ravel()[0]))
    log(f"batch {batch}: compile+warm {time.time()-t0:.0f}s")
    times = []
    for gi in range(3):
        t0 = time.time()
        for i in range(3):
            img = run(gi*3+i+1)
        float(np.asarray(img.ravel()[0]))
        times.append((time.time()-t0)/(3*batch))
    m = float(np.mean(times))
    log(f"batch {batch}: {m*1000:.0f} ms/img -> {60/m:.1f} img/min (rsd {np.std(times)/m*100:.1f}%)")
