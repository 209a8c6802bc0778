"""Progress reporting wrappers for the batch iterator.

Message-based progress (log lines every N records) is always available;
bar-based progress uses tqdm when importable. Analog of the reference's
``atropos/io/progress.py``.
"""
import logging

from atropos_tpu.util import MAGNITUDE


def magnitude_formatter(magnitude):
    suffix = ""
    if magnitude is None:
        div = 1.0
    else:
        div = float(MAGNITUDE[magnitude.upper()])
        suffix = magnitude
    return lambda val: "{:.1f} {}".format(val / div, suffix)


class ProgressMessageReader:
    """Iterate batches, logging a progress message every ``interval``
    records."""

    def __init__(self, iterable, batch_size, interval=1000000, max_items=None, mag_format=None):
        self.iterable = iterable
        self.batch_size = batch_size
        self.interval = interval
        self.ctr = 0
        self.mag_format = mag_format
        if max_items:
            if mag_format:
                max_items = mag_format(max_items)
            else:
                max_items = str(max_items)
            self.msg = "Read {0}/" + max_items + " records in {1:.1f} seconds"
        else:
            self.msg = "Read {0} records in {1:.1f} seconds"
        self.start_time = None

    def __next__(self):
        value = next(self.iterable)
        if value:
            self.ctr += value[0]["size"]
            if self.ctr % self.interval < self.batch_size:
                import time

                duration = time.time() - self.start_time
                ctr = self.mag_format(self.ctr) if self.mag_format else self.ctr
                logging.getLogger().info(self.msg.format(ctr, duration))
        return value

    next = __next__

    def __iter__(self):
        import time

        self.start_time = time.time()
        return self

    def close(self):
        logging.getLogger().info("Read a total of %s records", self.ctr)


def create_progress_reader(
    reader, progress_type="msg", batch_size=1, max_items=None,
    counter_magnitude="M", **kwargs
):
    """Wrap an iterable of batches in a progress reporter. Falls back to
    message-based progress if bar libraries are unavailable."""
    mag_format = magnitude_formatter(counter_magnitude)

    if progress_type == "msg":
        return ProgressMessageReader(
            reader, batch_size, max_items=max_items, mag_format=mag_format, **kwargs
        )

    try:
        from tqdm import tqdm

        class TqdmReader:
            def __init__(self, iterable):
                self._bar = tqdm(iterable)
                self._iter = iter(self._bar)

            def __iter__(self):
                return self

            def __next__(self):
                return next(self._iter)

            def close(self):
                self._bar.close()

        return TqdmReader(reader)
    except ImportError:
        logging.getLogger().warning(
            "No progress bar library available; falling back to messages"
        )
        return ProgressMessageReader(
            reader, batch_size, max_items=max_items, mag_format=mag_format, **kwargs
        )
