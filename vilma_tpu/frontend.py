"""Command line interface for vilma_tpu.

Same subcommand registry, --logfile/--verbose handling, and dispatch
behavior as the reference CLI (reference frontend.py:14-74).
"""
import logging
from argparse import ArgumentParser

from vilma_tpu import VERSION
from vilma_tpu.commands.make_ld_schema import main as make_ld_schema
from vilma_tpu.commands.make_ld_schema import args as make_ld_schema_args
from vilma_tpu.commands.check_ld_schema import main as check_ld_schema
from vilma_tpu.commands.check_ld_schema import args as check_ld_schema_args
from vilma_tpu.commands.sim import main as sim
from vilma_tpu.commands.sim import args as sim_args
from vilma_tpu.commands.fit import main as fit
from vilma_tpu.commands.fit import args as fit_args

COMMANDS = {
    'make_ld_schema': {'cmd': make_ld_schema, 'parser': make_ld_schema_args},
    'check_ld_schema': {'cmd': check_ld_schema,
                        'parser': check_ld_schema_args},
    'sim': {'cmd': sim, 'parser': sim_args},
    'fit': {'cmd': fit, 'parser': fit_args},
}


def main():
    parser = ArgumentParser(
        description="""
                    vilma-tpu v%s uses variational inference to estimate
                    variant effect sizes from GWAS summary data while
                    simultaneously learning the overall distribution of
                    effects, accelerated on TPUs via JAX/XLA.
                    """ % VERSION,
        usage='vilma-tpu <command> <options>'
    )
    subparsers = parser.add_subparsers(title='Commands', dest='command')
    for cmd in COMMANDS:
        cmd_parser = COMMANDS[cmd]['parser'](subparsers)
        cmd_parser.add_argument(
            '--logfile', required=False, type=str, default='',
            help='File to store information about the run. To print to '
                 'stdout use "-". Defaults to no logging.')
        cmd_parser.add_argument(
            '--verbose', dest='verbose', action='store_true',
            help='Log all information (as opposed to just warnings)')
    args = parser.parse_args()
    try:
        func = COMMANDS[args.command]['cmd']
    except KeyError:
        parser.print_help()
        exit()
    level = 10 if args.verbose else 30
    if args.logfile == '-':
        logging.basicConfig(level=level)
    elif args.logfile:
        logging.basicConfig(filename=args.logfile, level=level)
    func(args)


if __name__ == '__main__':
    main()
