"""The `check_ld_schema` command: inspect and analyze LD schemas.

Same options and outputs as the reference (reference
check_ld_schema.py:10-189): --listvars variant dumps and --trace low-rank
approximation quality diagnostics (total and per-annotation traces).
"""
import logging

import numpy as np
import pandas as pd

from vilma_tpu.io import load
from vilma_tpu.ops import blocks


def args(super_parser):
    parser = super_parser.add_parser(
        'check_ld_schema',
        description='Utilities for analyzing LD schema.',
        usage='vilma-tpu check_ld_schema <options>',
    )
    parser.add_argument('--listvars', required=False, type=str, default='',
                        help='Path at which to print a list of all variants '
                             'present in this schema.')
    parser.add_argument('--trace', required=False, type=str, default='',
                        help='Path at which to print information about the '
                             'trace of the low rank approximation of the LD '
                             'matrix relative to its size.')
    parser.add_argument('--trace-ldthresh', required=False, type=float,
                        default=1.,
                        help='Threshold for singular value approximation of '
                             'LD matrix used when computing the trace.')
    parser.add_argument('--trace-annotations', required=False, type=str,
                        default='',
                        help='Path to an annotations file; if provided the '
                             'trace is also reported per annotation.')
    parser.add_argument('--ld-schema', required=True, type=str,
                        help='Path to LD panel schema.')
    parser.add_argument('--trace-mmap', dest='mmap', action='store_true',
                        help='Accepted for compatibility (see fit --mmap).')
    parser.add_argument('--trace-extract', required=False, type=str,
                        default='',
                        help='List of SNPs to include in trace analysis, '
                             'with ID, A1, and A2 columns.')
    return parser


def compute_trace(block_ld_mat, one_hot_annotations):
    """Total and per-annotation traces of the (approximated) LD matrix
    (reference check_ld_schema.py:72-123)."""
    ld_diags = np.asarray(blocks.diag(block_ld_mat))
    total_trace = ld_diags.sum()
    total_snps = block_ld_mat.shape[0] - len(block_ld_mat.missing)

    trace_summary = pd.DataFrame(
        {'annotation': ['all_snps'],
         'trace': [total_trace],
         'num_snps': [total_snps],
         'ratio': [total_trace / total_snps]}
    )

    if not np.all(one_hot_annotations.sum(axis=1) == 1):
        raise ValueError('one_hot_annotations must be one-hot encoded.')

    if one_hot_annotations.shape[1] > 1:
        not_missing = np.ones(ld_diags.shape[0])
        not_missing[list(block_ld_mat.missing)] = 0.
        annotation_snps = not_missing.dot(one_hot_annotations)
        annotation_trace = ld_diags.dot(one_hot_annotations)
        annotation_labels = ['annotation_' + str(i) for i in
                             range(one_hot_annotations.shape[1])]
        trace_summary = pd.concat(
            [trace_summary,
             pd.DataFrame({'annotation': annotation_labels,
                           'trace': annotation_trace,
                           'num_snps': annotation_snps,
                           'ratio': annotation_trace / annotation_snps})],
            axis=0, ignore_index=True)
    return trace_summary


def combine_vars(ld_schema):
    """All SNP metadata rows of an LD schema as one DataFrame
    (reference check_ld_schema.py:126-144)."""
    all_vars = []
    for snp_path, _ in load.schema_iterator(ld_schema):
        all_vars.append(pd.read_csv(snp_path, header=None, sep=r'\s+',
                                    names=['ID', 'CHROM', 'BP',
                                           'CM', 'A1', 'A2']))
    return pd.concat(all_vars, ignore_index=True)


def main(args):
    # diagnostics are f64 host-side work (matches reference precision)
    import jax
    jax.config.update('jax_enable_x64', True)
    jax.config.update('jax_platforms', 'cpu')
    if args.trace_annotations and not args.trace:
        raise ValueError('If --trace-annotations is provided then '
                         '--trace must also be provided.')
    if args.trace_ldthresh != 1 and not args.trace:
        raise ValueError('If --trace-ldthresh is provided then '
                         '--trace must also be provided.')
    if not args.trace and not args.listvars:
        raise ValueError('If neither --trace nor --listvars '
                         'are provided, then this command does nothing.')

    logging.info('Collecting list of variants in LD Schema.')
    all_vars = combine_vars(args.ld_schema)
    if args.trace:
        logging.info('Computing trace statistics.')
        if args.trace_extract:
            variants = load.load_variant_list(args.trace_extract)
        else:
            variants = all_vars.copy()
        annotations, denylist = load.load_annotations(
            args.trace_annotations, variants)
        ld_mat, missing = load.load_ld_from_schema(
            args.ld_schema, variants=variants, denylist=denylist,
            ldthresh=args.trace_ldthresh, mmap=args.mmap)
        trace_summary = compute_trace(ld_mat, annotations)
        trace_summary.to_csv(args.trace, sep='\t', index=False)

    if args.listvars:
        logging.info('Saving list of variants')
        all_vars.to_csv(args.listvars, sep='\t', index=False)
