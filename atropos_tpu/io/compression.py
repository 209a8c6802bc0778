"""Transparent compression support (.gz/.bz2/.xz).

Mirrors the reference's behavior (``atropos/io/compression.py``): prefer the
system ``gzip`` program via a pipe for throughput (decompression in a
separate process overlaps with parsing), falling back to the Python
libraries.
"""
import bz2
import gzip
import io
import lzma
import os
from subprocess import PIPE, Popen

COMPRESSORS = {
    ".gz": gzip,
    ".bz2": bz2,
    ".xz": lzma,
}


class GzipWriter:
    """Pipe bytes through the system gzip program to a file."""

    def __init__(self, path, mode="w"):
        self.name = path
        self.outfile = open(path, mode)
        self.devnull = open(os.devnull, "w")
        self.closed = False
        try:
            self.process = Popen(
                [get_program_path("gzip")],
                stdin=PIPE,
                stdout=self.outfile,
                stderr=self.devnull,
                close_fds=True,
            )
        except IOError:
            self.outfile.close()
            self.devnull.close()
            raise

    def readable(self):
        return False

    def writable(self):
        return True

    def seekable(self):
        return False

    def write(self, arg):
        self.process.stdin.write(arg)

    def flush(self):
        self.process.stdin.flush()

    def close(self):
        self.closed = True
        self.process.stdin.close()
        retcode = self.process.wait()
        self.outfile.close()
        self.devnull.close()
        if retcode != 0:
            raise IOError(
                "Output gzip process terminated with exit code {0}".format(retcode)
            )

    def __enter__(self):
        return self

    def __exit__(self, *exc_info):
        self.close()


class GzipReader:
    """Read decompressed bytes from the system gzip program."""

    def __init__(self, path):
        self.name = path
        self.process = Popen([get_program_path("gzip"), "-cd", path], stdout=PIPE)
        self.closed = False

    def readable(self):
        return True

    def writable(self):
        return False

    def seekable(self):
        return False

    def flush(self):
        pass

    def close(self):
        if self.closed:
            return
        self.closed = True
        retcode = self.process.poll()
        if retcode is None:
            self.process.terminate()
        self._raise_if_error()

    def __iter__(self):
        for line in self.process.stdout:
            yield line
        self.process.wait()
        self._raise_if_error()

    def _raise_if_error(self):
        retcode = self.process.poll()
        if retcode is not None and retcode != 0:
            raise EOFError(
                "gzip process returned non-zero exit code {0}. Is the "
                "input file truncated or corrupt?".format(retcode)
            )

    def read(self, *args):
        data = self.process.stdout.read(*args)
        if len(args) == 0 or args[0] <= 0:
            self.process.wait()
        self._raise_if_error()
        return data

    def __enter__(self):
        return self

    def __exit__(self, *exc_info):
        self.close()


def can_use_system_compression():
    return get_program_path("gzip") is not None


def get_compressor(filename):
    ext = os.path.splitext(filename)[1]
    return COMPRESSORS.get(ext)


def open_gzip_file(filename, mode, use_system=True):
    if use_system:
        try:
            if "r" in mode:
                gzfile = GzipReader(filename)
            else:
                gzfile = GzipWriter(filename)
            if "t" in mode:
                gzfile = io.TextIOWrapper(gzfile)
            return gzfile
        except Exception:
            pass

    gzfile = gzip.open(filename, mode)
    if "b" in mode:
        if "r" in mode:
            gzfile = io.BufferedReader(gzfile)
        else:
            gzfile = io.BufferedWriter(gzfile)
    return gzfile


def open_bzip_file(filename, mode, **kwargs):
    if "t" in mode:
        return io.TextIOWrapper(bz2.BZ2File(filename, mode[0]))
    return bz2.BZ2File(filename, mode)


def open_lzma_file(filename, mode, **kwargs):
    return lzma.open(filename, mode)


FILE_OPENERS = {
    ".gz": open_gzip_file,
    ".bz2": open_bzip_file,
    ".xz": open_lzma_file,
}


def get_file_opener(filename):
    ext = os.path.splitext(filename)[1]
    return FILE_OPENERS.get(ext)


PROGRAM_CACHE = {}


def get_program_path(program):
    """Resolve and cache a program's path from $PATH."""
    if program in PROGRAM_CACHE:
        return PROGRAM_CACHE[program]

    def is_exe(fpath):
        return os.path.isfile(fpath) and os.access(fpath, os.X_OK)

    exe_file = None
    fpath, _ = os.path.split(program)
    if fpath:
        if is_exe(program):
            exe_file = program
    else:
        for path in os.environ["PATH"].split(os.pathsep):
            path = path.strip('"')
            candidate = os.path.join(path, program)
            if is_exe(candidate):
                exe_file = candidate
                break
        else:
            exe_file = None

    PROGRAM_CACHE[program] = exe_file
    return exe_file


def splitext_compressed(name):
    """Split ``name`` into (stem, filetype_ext, compression_ext_or_None)."""
    ext1 = ext2 = None
    for ext in COMPRESSORS:
        if name.endswith(ext):
            ext2 = ext
            name = name[: -len(ext)]
            break
    name, ext1 = os.path.splitext(name)
    return (name, ext1, ext2)


def open_compressed_file(filename, mode):
    """Open a compressed file, picking the decompressor from the file
    extension (reference ``atropos/io/compression.py:243-258``)."""
    opener = get_file_opener(filename)
    if not opener:
        raise ValueError("{} is not a recognized compression format".format(
            filename))
    return opener(filename, mode)
