"""Cursor-based text reader (SURVEY.md P8): read a text by line,
paragraph, page, or arbitrary delimiter, with peek-ahead and
look-behind — the observable semantics of the reference's TextReader
(ferenda/textreader.py:11-353), golden-checked against its own
LICENSE.txt fixture expectations (testTextReader.py:20-102).

Inside the Spark engine this backs per-document sequential chunking
within Arrow batches (the FSM parse path uses the paragraph unit);
it is deliberately Spark-free.
"""

from __future__ import annotations

import io


class TextReader:
    UNIX = "\n"
    DOS = "\r\n"
    MAC = "\r"

    def __init__(self, filename: str | None = None,
                 encoding: str | None = None,
                 string: str | None = None,
                 linesep: str | None = None):
        if filename is None and string is None:
            raise TypeError("Must specify either filename or string")
        self.name = filename
        self.encoding = encoding or "ascii"
        self.linesep = linesep or "\n"
        self.autostrip = False
        self.autodewrap = False
        self.expandtabs = True
        if filename is not None:
            with io.open(filename, encoding=self.encoding) as f:
                self.data = f.read()
        else:
            self.data = string
        self.currpos = 0
        self.maxpos = len(self.data)
        self._lastread = ""
        self._iterfunc = self.readline
        self._iterargs = ()

    # ------------------------------------------------------- internals

    def _find(self, delimiter, startpos):
        idx = self.data.find(delimiter, startpos)
        if idx == -1:
            res = self.data[startpos:]
            return res, startpos + len(res)
        return self.data[startpos:idx], idx + len(delimiter)

    def _rfind(self, delimiter, startpos):
        idx = self.data.rfind(delimiter, 0, startpos)
        if idx == -1:
            return self.data[:startpos], 0
        return self.data[idx + len(delimiter):startpos], idx

    def _process(self, s):
        if self.autostrip:
            s = s.strip()
        if self.autodewrap:
            s = s.replace(self.linesep, " ")
        if self.expandtabs:
            s = s.expandtabs(8)
        return s

    # ------------------------------------------------------ positioning

    def eof(self):
        return self.currpos == self.maxpos

    def bof(self):
        return self.currpos == 0

    def seek(self, offset, whence=0):
        if whence != 0:
            raise NotImplementedError("whence must be 0")
        self.currpos = offset

    def tell(self):
        return self.currpos

    def cue(self, string):
        idx = self.data.find(string, self.currpos)
        if idx == -1:
            raise IOError("Could not find %r in file" % string)
        self.currpos = idx

    def cuepast(self, string):
        self.cue(string)
        self.currpos += len(string)

    # ----------------------------------------------------------- reads

    def read(self, size=0):
        res = self.data[self.currpos:self.currpos + size]
        self.currpos += len(res)
        self._lastread = res
        return self._process(res)

    def readto(self, string):
        idx = self.data.find(string, self.currpos)
        if idx == -1:
            raise IOError("Could not find %r in file" % string)
        res = self.data[self.currpos:idx]
        self.currpos = idx
        return self._process(res)

    def readline(self, size=None):
        return self.readchunk(self.linesep)

    def readchunk(self, delimiter):
        self._lastread, self.currpos = self._find(delimiter, self.currpos)
        return self._process(self._lastread)

    def readparagraph(self):
        """All text up to two or more consecutive line separators;
        leading and trailing separator runs are consumed."""
        n = len(self.linesep)
        while self.data[self.currpos:self.currpos + n] == self.linesep:
            self.currpos += n
        res = self.readchunk(self.linesep * 2)
        while self.data[self.currpos:self.currpos + n] == self.linesep:
            self.currpos += n
        return res

    def readpage(self):
        return self.readchunk("\f")

    def lastread(self):
        return self._process(self._lastread)

    # ----------------------------------------------------------- peeks

    def peek(self, size=0):
        return self._process(self.data[self.currpos:self.currpos + size])

    def peekchunk(self, delimiter, times=1):
        pos = self.currpos
        res = ""
        for _ in range(times):
            res, newpos = self._find(delimiter, pos)
            if newpos == pos:
                raise IOError("Peek past end of file")
            pos = newpos
        return self._process(res)

    def peekline(self, times=1):
        return self.peekchunk(self.linesep, times)

    def peekparagraph(self, times=1):
        saved = self.currpos
        try:
            n = len(self.linesep)
            while self.data[self.currpos:self.currpos + n] == self.linesep:
                self.currpos += n
            return self.peekchunk(self.linesep * 2, times)
        finally:
            self.currpos = saved

    # ------------------------------------------------------ look-backs

    def prev(self, size=0):
        return self._process(self.data[self.currpos - size:self.currpos])

    def prevchunk(self, delimiter, times=1):
        pos = self.currpos
        res = ""
        for _ in range(times):
            res, newpos = self._rfind(delimiter, pos)
            if newpos == pos:
                raise IOError("Prev (backwards peek) past start of file")
            pos = newpos
        return self._process(res)

    def prevline(self, times=1):
        return self.prevchunk(self.linesep, times)

    def prevparagraph(self, times=1):
        return self.prevchunk(self.linesep * 2, times)

    # ------------------------------------------------------- iteration

    def getreader(self, callableobj, *args, **kwargs):
        """A new TextReader over the result of one read*/peek*/prev*."""
        return TextReader(string=callableobj(*args, **kwargs),
                          linesep=self.linesep)

    def getiterator(self, callableobj, *args, **kwargs):
        """Iterate using any read* method as the unit."""
        self._iterfunc = lambda: callableobj(*args, **kwargs)
        return self

    def __iter__(self):
        return self

    def __next__(self):
        if self.eof():
            self._iterfunc = self.readline
            raise StopIteration
        return self._iterfunc()

    next = __next__
