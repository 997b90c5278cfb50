"""Export a bench-cache factor archive as an on-disk LD schema + sumstats.

Turns the synthetic genome used by bench.py (`.bench_cache/ld_*.npz`,
AR(1)-correlation blocks eigendecomposed at half rank) into the
reference's on-disk fit inputs — stacked-eigendecomposition `.npy`
blocks (rows [eigenvectors; eigenvalues], reference load.py:166-234),
`.var` variant files, a `.schema` manifest, sumstats TSVs, and an
extract list — so the full production CLI (`vilma-tpu fit`) can be
driven end-to-end at genome scale on real hardware:

    python tools/export_synthetic_schema.py /tmp/demo 100000
    python -m vilma_tpu.frontend fit \
        --sumstats /tmp/demo/pop1.sumstats.tsv,/tmp/demo/pop2.sumstats.tsv \
        --ld-schema /tmp/demo/schema.schema,/tmp/demo/schema.schema \
        --extract /tmp/demo/extract.tsv --names pop1,pop2 \
        --samplesizes 1e5,1e5 --init-hg 0.3,0.3 -K 2 --seed 42 \
        --precision f32 --ld-precision bf16 --num-its 30 \
        --output /tmp/demo/run --logfile -
"""
import os
import sys

import numpy as np


def main(out_dir, num_loci=100_000, block_size=1024, rank_frac=0.5,
         num_pops=2, seed=1):
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.bench_cache',
        f'ld_{num_loci}_{block_size}_{rank_frac}.npz')
    if not os.path.exists(cache):
        raise SystemExit(f'no factor cache at {cache}; run '
                         f'BENCH_SIZE={num_loci} python bench.py once '
                         '(CPU leg) to generate it')
    os.makedirs(out_dir, exist_ok=True)
    z = np.load(cache)
    nb = int(z['num_blocks'])

    ids = np.array([f'snp{i}' for i in range(num_loci)])
    manifest = []
    for b in range(nb):
        u, s, ix = z[f'u{b}'], z[f's{b}'], z[f'ix{b}']
        base = f'schema_1:{b}'
        # stacked eigendecomposition layout: (n+1) x k, last row = s
        np.save(os.path.join(out_dir, base + '.npy'),
                np.vstack([u, s[None, :]]).astype(np.float32))
        with open(os.path.join(out_dir, base + '.var'), 'w') as fh:
            for i in ix:
                fh.write(f'{ids[i]}\t1\t{int(i)}\t0.0\tA\tG\n')
        manifest.append(f'{base}.var\t{base}.npy')
    with open(os.path.join(out_dir, 'schema.schema'), 'w') as fh:
        fh.write('\n'.join(manifest) + '\n')

    # same marginal-effect construction as bench._build
    rng = np.random.default_rng(seed)
    std_errs = rng.uniform(0.01, 0.05, (num_pops, num_loci))
    betas = rng.standard_normal((num_pops, num_loci)) * std_errs * 2
    for p in range(num_pops):
        path = os.path.join(out_dir, f'pop{p + 1}.sumstats.tsv')
        with open(path, 'w') as fh:
            fh.write('ID\tA1\tA2\tBETA\tSE\n')
            for i in range(num_loci):
                fh.write(f'{ids[i]}\tA\tG\t{betas[p, i]:.6e}\t'
                         f'{std_errs[p, i]:.6e}\n')
    with open(os.path.join(out_dir, 'extract.tsv'), 'w') as fh:
        fh.write('ID\tA1\tA2\n')
        for i in range(num_loci):
            fh.write(f'{ids[i]}\tA\tG\n')
    print(f'wrote {nb} blocks + {num_pops} sumstats for {num_loci} SNPs '
          f'to {out_dir}')


if __name__ == '__main__':
    out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/vilma_tpu_demo'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    main(out, num_loci=n)
