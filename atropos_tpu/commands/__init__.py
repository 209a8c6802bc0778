"""
Atropos-TPU version {}

usage: atropos [--config <config file>] <command> [options]

commands
--------
{}

optional arguments:
  -h, --help                show this help message and exit
  --config <config file>    provide options in a config file

Use "atropos <command> --help" to see all options for a specific command.
"""
from importlib import import_module
import logging
import os
from pkgutil import walk_packages
import re
import textwrap

from atropos_tpu import __version__


class Command:
    """A command package: ``__init__.CommandRunner`` + ``cli.CommandParser``
    + ``reports.ReportGenerator``, discovered by convention (the same
    registry convention as the reference, ``atropos/commands/__init__.py``).
    """

    def __init__(self, name, module=None, cli_module=None, report_module=None):
        self.name = name
        self.package = module or "atropos_tpu.commands.{}".format(name)
        self.cli_module = cli_module or "{}.cli".format(self.package)
        self.report_module = report_module or "{}.reports".format(self.package)

    def execute(self, args=()):
        """Parse args, run the command, generate reports; returns
        (retcode, summary)."""
        options = self.parse_args(args)
        retcode, summary = self.run_command(options)
        if retcode == 0 and options.report_file:
            logging.getLogger().debug("Writing report to %s", options.report_file)
            self.generate_reports(summary, options)
        else:
            logging.getLogger().debug("Not generating report file")
        return retcode, summary

    def get_command_parser_class(self):
        mod = import_module(self.cli_module)
        return mod.CommandParser

    @property
    def usage(self):
        return self.get_command_parser_class().usage

    @property
    def description(self):
        return self.get_command_parser_class().description

    def get_help(self, fmt="* {name}: {description}", wrap=80, indent=2):
        helpstr = fmt.format(name=self.name, description=self.description.strip())
        if wrap:
            helpstr = "\n".join(
                textwrap.wrap(
                    re.sub(r"\s+", " ", helpstr), wrap,
                    subsequent_indent=" " * indent,
                )
            )
        return helpstr

    def parse_args(self, args):
        parser_class = self.get_command_parser_class()
        parser = parser_class()
        return parser.parse(args)

    def get_command_runner_class(self):
        mod = import_module(self.package)
        return mod.CommandRunner

    def run_command(self, options):
        runner_class = self.get_command_runner_class()
        runner = runner_class(options)
        return runner.run()

    def get_report_generator_class(self):
        mod = import_module(self.report_module)
        return mod.ReportGenerator

    def generate_reports(self, summary, options):
        generator_class = self.get_report_generator_class()
        generator = generator_class(options)
        generator.generate_reports(summary)


COMMANDS = dict(
    (name, Command(name))
    for _, name, ispkg in walk_packages([os.path.dirname(__file__)])
    if ispkg
)


def get_command(name):
    if name not in COMMANDS:
        raise ValueError("Invalid command: {}".format(name))
    return COMMANDS[name]


def iter_commands():
    for name in sorted(COMMANDS.keys()):
        yield COMMANDS[name]


def execute_cli(args=()):
    """Entry point: dispatch to a subcommand ('trim' when the first arg is
    an option), with ``--config FILE`` support."""
    if len(args) == 0 or args[0] in ("-h", "--help"):
        print_subcommands()
        return 2

    config_args = None

    if args[0] == "--config":
        with open(args[1], "rt") as config_file:
            config_args = list(
                token for line in config_file for token in line.rstrip().split()
            )
        args = args[2:]

    def parse_command(args):
        if not args or args[0][0] == "-":
            return ("trim", args)
        return (args[0], args[1:])

    if len(args) == 0:
        command_name, args = parse_command(config_args)
    else:
        command_name, args = parse_command(args)
        if config_args:
            args = config_args + args

    try:
        command = get_command(command_name)
        retcode, summary = command.execute(args)
        if "exception" in summary:
            logging.getLogger().error(
                "Error executing command %s",
                command_name,
                exc_info=summary["exception"]["details"],
            )
        return retcode
    except Exception as err:
        logging.getLogger().error(
            "Error executing command: %s", command_name, exc_info=err
        )
        return 2


def print_subcommands():
    print(
        __doc__.format(
            __version__, "\n".join(command.get_help() for command in iter_commands())
        )
    )
