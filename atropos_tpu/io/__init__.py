"""Transparent file opening helpers (compressed files, stdout/stderr).

Parity with the reference ``atropos/io/__init__.py``: ``-`` means stdout,
``_`` means stderr, and extensions select a (de)compressor.
"""
import errno
import os
import sys

from atropos_tpu.io.compression import get_file_opener

STDOUT = "-"
STDERR = "_"


def abspath(path):
    return os.path.abspath(os.path.expanduser(path))


def resolve_path(path, parent=None):
    apath = abspath(path)
    if not os.path.exists(apath) and parent is not None:
        apath = abspath(os.path.join(parent, path))
    if not os.path.exists(apath):
        raise IOError(errno.ENOENT, "%s does not exist" % apath, apath)
    return apath


def check_path(path, ptype=None, access=None):
    if ptype == "f" and not path.startswith("/dev/") and not os.path.isfile(path):
        raise IOError(errno.EISDIR, "{} is not a file".format(path), path)
    elif ptype == "d" and not os.path.isdir(path):
        raise IOError(errno.ENOTDIR, "{} is not a directory".format(path), path)
    elif not os.path.exists(path):
        raise IOError(errno.ENOENT, "{} does not exist".format(path), path)
    if access is not None and not os.access(path, access):
        raise IOError(errno.EACCES, "{} is not accessable".format(path), path)
    return path


def check_writeable(rawpath, ptype=None):
    if rawpath in (STDOUT, STDERR):
        return rawpath
    rawpath = abspath(rawpath)
    try:
        path = resolve_path(rawpath)
        check_path(path, ptype, os.W_OK)
    except IOError:
        dirpath = os.path.dirname(rawpath)
        if os.path.exists(dirpath):
            check_path(dirpath, "d", os.W_OK)
        else:
            os.makedirs(dirpath)
        path = os.path.join(dirpath, os.path.basename(rawpath))
    return path


def open_output(filename, mode="w", context_wrapper=False):
    """Open a file for (text or binary) writing; '-'/'_' = stdout/stderr."""
    if mode == "w":
        mode = "wt"
    elif mode == "a":
        mode = "at"
    if mode not in ("wt", "wb", "at", "ab"):
        raise ValueError("mode '{0}' not supported".format(mode))
    if not isinstance(filename, str):
        raise ValueError("the filename must be a string")

    if filename in (STDOUT, STDERR):
        fileobj = sys.stdout if filename == STDOUT else sys.stderr
        if mode == "wb":
            fileobj = fileobj.buffer
        if context_wrapper:

            class StdWrapper:
                def __init__(self, fileobj):
                    self.fileobj = fileobj

                def __enter__(self):
                    return self.fileobj

                def __exit__(self, exception_type, exception_value, traceback):
                    pass

            fileobj = StdWrapper(fileobj)
    else:
        filename = check_writeable(filename, "f")
        fileobj = open(filename, mode)

    return fileobj


def xopen(filename, mode="r", use_system=True):
    """Open a possibly-compressed file; '-'/'_' = stdio."""
    if mode == "r":
        mode = "rt"
    elif mode == "w":
        mode = "wt"
    elif mode == "a":
        mode = "at"
    if mode not in ("rt", "rb", "wt", "wb", "at", "ab"):
        raise ValueError("mode '{0}' not supported".format(mode))
    if not isinstance(filename, str):
        raise ValueError("the filename must be a string")

    if filename in (STDOUT, STDERR):
        if "r" in mode:
            fileobj = sys.stdin
        else:
            fileobj = sys.stdout if filename == STDOUT else sys.stderr
        if "b" in mode:
            fileobj = fileobj.buffer
        return fileobj

    file_opener = get_file_opener(filename)
    if file_opener:
        return file_opener(filename, mode, use_system=use_system)
    return open(filename, mode)
