"""TextReader (P8) parity with the reference's testTextReader
expectations over its own LICENSE.txt fixture
(test/files/textreader/LICENSE.txt, testTextReader.py:20-102)."""

import os

import pytest

from ferenda_spark.textreader import TextReader

LICENSE = "/root/reference/test/files/textreader/LICENSE.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LICENSE), reason="reference fixture not present")


@pytest.fixture(params=["file", "string"])
def f(request):
    if request.param == "file":
        return TextReader(LICENSE, linesep=TextReader.UNIX)
    data = open(LICENSE, encoding="ascii").read()
    return TextReader(string=data, linesep=TextReader.UNIX)


def test_readline(f):
    assert f.readline() == "A. HISTORY OF THE SOFTWARE"
    assert f.readline() == "=========================="


def test_iterate(f):
    assert f.bof() is True and f.eof() is False
    for _ in f:
        pass
    assert f.bof() is False and f.eof() is True


def test_readparagraph(f):
    assert f.readparagraph() == ("A. HISTORY OF THE SOFTWARE"
                                 + f.linesep + "==========================")
    assert f.readparagraph() == (
        "Python was created in the early 1990s by Guido van Rossum at "
        "Stichting" + f.linesep +
        "Mathematisch Centrum (CWI, see http://www.cwi.nl) in the "
        "Netherlands" + f.linesep +
        "as a successor of a language called ABC.  Guido remains "
        "Python's" + f.linesep +
        "principal author, although it includes many contributions "
        "from others.")
    # next paragraph after this cue is separated by three newlines
    f.cuepast("to make these releases possible.")
    assert f.readparagraph()[:23] == "B. TERMS AND CONDITIONS"


def test_readchunk(f):
    f.readchunk("(")
    assert f.readchunk(")") == "CWI, see http://www.cwi.nl"


def test_peekline(f):
    assert f.peekline() == "A. HISTORY OF THE SOFTWARE"
    assert f.peekline(4) == ("Python was created in the early 1990s by "
                             "Guido van Rossum at Stichting")


def test_peekparagraph(f):
    assert f.peekparagraph() == ("A. HISTORY OF THE SOFTWARE"
                                 + f.linesep
                                 + "==========================")
    assert f.peekparagraph(2).startswith(
        "Python was created in the early 1990s")
    # and it did not move the cursor
    assert f.bof()


def test_prevline(f):
    f.readparagraph()
    f.readparagraph()
    assert f.prevline(3) == ("principal author, although it includes "
                             "many contributions from others.")
    assert f.prevline(6) == ("Python was created in the early 1990s by "
                             "Guido van Rossum at Stichting")


def test_cue(f):
    f.cue("Guido")
    assert f.readline() == "Guido van Rossum at Stichting"


def test_cuepast(f):
    f.cuepast("Guido")
    assert f.readline() == " van Rossum at Stichting"


def test_readto(f):
    assert f.readto("SOFTWARE") == "A. HISTORY OF THE "


def test_readpage_and_getiterator():
    r = TextReader(string="page one\ftwo\fthree", linesep="\n")
    assert [p for p in r.getiterator(r.readpage)] == \
        ["page one", "two", "three"]


def test_getreader():
    r = TextReader(string="a b\n\nc d\f second page", linesep="\n")
    first = r.getreader(r.readpage)
    assert first.readparagraph() == "a b"
    assert first.readparagraph() == "c d"
