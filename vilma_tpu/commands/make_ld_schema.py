"""The `make_ld_schema` command: build a block LD matrix from genotypes.

Same behavior and on-disk format as the reference
(reference make_ld_schema.py:13-184): SNPs are read from PLINK files (via
the native vilma_tpu.io.plink decoder), partitioned into LD blocks from a
UCSC-style bed file, per-block NaN-aware pairwise correlations are
computed, optionally eigendecomposition-truncated, and written as
<root>_{chrom}:{block}.npy + .var + a manifest <root>.schema.
"""
import logging
import os
from pathlib import Path

import numpy as np
import pandas as pd

from vilma_tpu.io import plink
from vilma_tpu.ops import lowrank


def args(super_parser):
    parser = super_parser.add_parser(
        'make_ld_schema',
        description='Build a block diagonal LD matrix from genotype data '
                    'and store it in vilma format.',
        usage='vilma-tpu make_ld_schema <options>',
    )
    parser.add_argument('-o', '--out-root', required=True, type=str,
                        help='Path for output schema')
    parser.add_argument('-b', '--block-file', required=True, type=str,
                        help='Bed file containing LD block boundaries')
    parser.add_argument('-p', '--plink-file-list', required=True, type=str,
                        help='A file where each line is the basename of '
                             'plink format genotype data for a single '
                             'chromosome.')
    parser.add_argument('--extract', required=False, type=str, default='',
                        help='A file with a column ID that specifies which '
                             'SNPs to keep. Defaults to all variants.')
    parser.add_argument('--ldthresh', required=False, type=float, default=-1,
                        help='Threshold for computing SVD. Negative: no '
                             'SVD. In [0, 1]: setting x guarantees SNPs '
                             'with r^2 > x stay linearly independent in '
                             'the decomposition.')
    return parser


def _get_ld_blocks(bedfile_name):
    """Load LD block boundaries per chromosome, validating non-overlap
    (reference make_ld_schema.py:43-65)."""
    ld_table = pd.read_csv(bedfile_name, names=['chrom', 'start', 'end'],
                           comment='#', sep=r'\s+', header=None,
                           dtype={'chrom': str, 'start': int, 'end': int})
    ld_table_dict = {}
    for chrom in np.unique(ld_table['chrom']):
        sub_table = ld_table.loc[ld_table['chrom'] == chrom]
        sub_table = sub_table.sort_values(by='end', ignore_index=True)
        if not np.all(sub_table.start.to_numpy()[1:]
                      >= sub_table.end.to_numpy()[:-1]):
            raise ValueError('Bedfile contains an overlapping interval')
        ld_table_dict[chrom] = sub_table
    return ld_table_dict


def _nan_corr(genos):
    """NaN-aware pairwise correlation matching pandas.DataFrame.corr()
    (reference make_ld_schema.py:78): each pairwise correlation uses only
    samples observed for both SNPs."""
    return pd.DataFrame(genos).corr().to_numpy()


def _process_blocks(blocked_data, outfile_name, ldthresh=-1):
    """Compute per-block correlations and write .npy/.var/manifest
    (reference make_ld_schema.py:68-93)."""
    outpath = outfile_name + '_{}:{}'
    rel_outpath = outpath.split('/')[-1]
    var_outpath = outfile_name + '_{}:{}.var'
    rel_var_outpath = var_outpath.split('/')[-1]
    legend = []
    for key in blocked_data:
        logging.info('...computing correlations for block %s', key)
        corrmat = _nan_corr(blocked_data[key]['SNPs'])
        if ldthresh >= 0:
            f = lowrank.factor_block(X=corrmat, t=ldthresh,
                                     check_symmetric=False)
            corrmat = np.vstack([f.u, f.s.reshape((1, -1))])
        np.save(outpath.format(*key.split()), corrmat)
        with open(var_outpath.format(*key.split()), 'w') as ofh:
            for var in blocked_data[key]['IDs']:
                ofh.write('\t'.join(map(str, var)) + '\n')
        legend.append(rel_var_outpath.format(*key.split())
                      + '\t'
                      + (rel_outpath + '.npy').format(*key.split()))
    with open(outfile_name + '.schema', 'a') as ofh:
        ofh.write('\n'.join(legend) + '\n')


def _assign_to_blocks(blocks, plink_data, variants=None):
    """Assign SNP genotype rows to LD blocks
    (reference make_ld_schema.py:96-146): one chromosome per file,
    monomorphic/all-missing SNPs skipped, genotype 3 -> NaN."""
    blocked_data = {}
    blocked_ids = {}
    chromosome = None
    for locus, row in zip(plink_data.get_loci(), plink_data):
        if chromosome is None:
            chromosome = str(locus.chromosome)
            if chromosome not in blocks.keys():
                raise ValueError('Plink File contains a chromosome '
                                 'that is not in the bedfile.')
        if str(locus.chromosome) != chromosome:
            raise ValueError('Each plink file should contain exactly one '
                             'chromosome.')
        if variants and locus.name not in variants:
            continue
        block_idx = np.searchsorted(blocks[chromosome].start,
                                    locus.bp_position - 1,
                                    side='right') - 1
        if block_idx < 0:
            continue
        if locus.bp_position > blocks[chromosome].end[block_idx]:
            continue

        these_genos = np.asarray(row, dtype=float)
        these_genos[these_genos > 2.1] = np.nan
        if np.all(np.isnan(these_genos)) or np.nanstd(these_genos) == 0:
            continue

        key_str = '{} {}'.format(chromosome, block_idx)
        if key_str not in blocked_data:
            blocked_data[key_str] = []
            blocked_ids[key_str] = []
        blocked_data[key_str].append(these_genos)
        blocked_ids[key_str].append(
            [locus.name, chromosome, locus.bp_position,
             locus.position, locus.allele1, locus.allele2])

    for key, value in blocked_data.items():
        block_gts = np.stack(value, axis=0).T     # samples x snps
        blocked_data[key] = {'SNPs': block_gts, 'IDs': blocked_ids[key]}
    return blocked_data


def main(args):
    logging.info('Reading LD blocks from %s', args.block_file)
    ld_blocks = _get_ld_blocks(args.block_file)

    variants = None
    if args.extract:
        logging.info('Loading Variants from %s', args.extract)
        variants = pd.read_csv(args.extract, sep=r'\s+', header=0)
        if 'ID' not in variants.columns:
            raise ValueError(args.extract + ' must contain '
                             'a column labeled ID')
        variants = set(variants['ID'])
    if os.path.exists(args.out_root + '.schema'):
        raise ValueError(args.out_root + '.schema already exists. '
                         'Please delete before running.')

    plink_path = Path(args.plink_file_list)
    with open(plink_path, 'r') as plink_manifest:
        for idx, line in enumerate(plink_manifest):
            logging.info('Working on plink file %d', idx + 1)
            fname = Path(plink_path.parents[0], line.strip())
            plink_data = plink.open_plink(str(fname))
            logging.info('...assigning SNPs to blocks')
            blocked_data = _assign_to_blocks(ld_blocks, plink_data, variants)
            logging.info('...processing LD blocks')
            _process_blocks(blocked_data, args.out_root,
                            ldthresh=args.ldthresh)
    logging.info('Done!')
