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
    """Wrap an iterable of batches in a progress reporter. Bar mode tries
    progressbar2, then tqdm, then returns the reader unwrapped with a
    warning (reference ``atropos/io/progress.py:64-105``)."""
    mag_format = magnitude_formatter(counter_magnitude)

    if progress_type == "msg":
        return ProgressMessageReader(
            reader, batch_size, max_items=max_items, mag_format=mag_format, **kwargs
        )

    try:
        return create_progressbar_reader(reader, max_items, mag_format, **kwargs)
    except Exception:
        pass

    try:
        return create_tqdm_reader(reader, max_items, **kwargs)
    except Exception:
        pass

    logging.getLogger().warning("No progress bar library available")
    return reader


def create_progressbar_reader(reader, max_reads=None, mag_format=None):
    """Wrap a batch iterable in a progressbar2 ProgressBar (reference
    ``atropos/io/progress.py:118-184``)."""
    import progressbar
    import progressbar.widgets

    class ProgressBarReader(progressbar.ProgressBar):
        def __init__(self, iterable, widgets, max_value=None):
            super().__init__(
                widgets=widgets,
                max_value=max_value or progressbar.UnknownLength,
            )
            self._iterable = iterable
            self.done = False

        def __next__(self):
            try:
                value = next(self._iterable)
                if self.start_time is None:
                    self.start()
                self.update(self.value + value[0]["size"])
                return value
            except StopIteration:
                self.close()
                raise

        def close(self):
            if not self.done:
                self.finish()
                self.done = True
            try:
                self._iterable.close()
            except Exception:
                pass

    class MagCounter(progressbar.widgets.WidgetBase):
        def __init__(self, fmt):
            super().__init__()
            self._format = fmt

        def __call__(self, progress, data):
            return self._format(data["value"])

    if max_reads:
        return ProgressBarReader(
            reader,
            [
                MagCounter(mag_format), " Reads (", progressbar.Percentage(),
                ") ", progressbar.Timer(), " ", progressbar.Bar(),
                progressbar.AdaptiveETA(),
            ],
            max_reads,
        )
    return ProgressBarReader(
        reader,
        [
            MagCounter(mag_format), " Reads", progressbar.Timer(),
            progressbar.AnimatedMarker(),
        ],
    )


def create_tqdm_reader(reader, max_reads=None):
    """Wrap an iterable in a tqdm progress bar."""
    import tqdm

    return tqdm.tqdm(reader, total=max_reads)
