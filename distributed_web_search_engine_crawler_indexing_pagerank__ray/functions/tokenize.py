"""Tokenization + stopwords, exact to the reference.

Reference:
- stopword list: ``src/tools/StopWords.java:27-66`` (NLTK base + web noise)
- indexer tokenizer: ``src/jobs/Indexer.java:214-241`` (lowercase split
  ``[^a-z]+``, drop len>25, stopwords; keep per-doc freq >= 2)
- tfidf tokenizer: ``src/jobs/TfIdf.java:293-312`` (same, no min-freq)
- query tokenizer: ``src/frontend/handler/ResultPageHandler.java:450-461``
  (lowercase whitespace split, drop stopwords)
"""

from __future__ import annotations

import re
from collections import Counter

STOP_WORDS = frozenset(
    """a about above after again against ain all am an and any are aren aren't as at be
because been before being below between both but by can couldn couldn't d did didn
didn't do does doesn doesn't doing don don't down during each few for from further had
hadn hadn't has hasn hasn't have haven haven't having he he'd he'll her here hers
herself he's him himself his how i i'd if i'll i'm in into is isn isn't it it'd it'll
it's its itself i've just ll m ma me mightn mightn't more most mustn mustn't my myself
needn needn't no nor not now o of off on once only or other our ours ourselves out over
own re s same shan shan't she she'd she'll she's should shouldn shouldn't should've so
some such t than that that'll the their theirs them themselves then there these they
they'd they'll they're they've this those through to too under until up ve very was wasn
wasn't we we'd we'll we're were weren weren't we've what when where which while who whom
why will with won won't wouldn wouldn't y you you'd you'll your you're yours yourself
yourselves you've
http https www com org net
html htm css js javascript script href src img
json xml utf utf8 iso
page pages site sites homepage home index
nav menu footer header sidebar
login logout signin signup register account
cookie cookies policy policies privacy terms
agreement copyright trademark
click button submit search results filter""".split()
)

MAX_WORD_LENGTH = 25

_NON_AZ_RE = re.compile(r"[^a-z]+")
_WS_SPLIT_RE = re.compile(r"\s+", re.ASCII)


def is_stop_word(word: str | None) -> bool:
    if word is None:
        return False
    return word.lower() in STOP_WORDS


def tokenize_az(text: str) -> list[str]:
    """Lowercase, split on ``[^a-z]+``, keep non-empty tokens of len<=25
    that aren't stopwords (Indexer/TfIdf shared core)."""
    out = []
    for tok in _NON_AZ_RE.split(text.lower()):
        if not tok or len(tok) > MAX_WORD_LENGTH:
            continue
        if tok in STOP_WORDS:
            continue
        out.append(tok)
    return out


def word_counts(text: str) -> Counter:
    """Per-document term counts (``Indexer.java:214-227`` /
    ``TfIdf.java:293-312``)."""
    return Counter(tokenize_az(text))


def index_words(text: str, min_freq: int = 2) -> list[str]:
    """Words a document contributes to the inverted index
    (``Indexer.java:233-241``): per-doc frequency >= min_freq.
    Returned sorted for deterministic downstream order (the reference
    iterates a HashSet — nondeterministic; see SURVEY §7.3)."""
    wc = word_counts(text)
    return sorted(w for w, c in wc.items() if c >= min_freq)


def query_tokens(raw_query: str | None) -> list[str]:
    """``ResultPageHandler.filterStopWords`` (``ResultPageHandler.java:450-461``)."""
    if not raw_query:
        return []
    return [
        w
        for w in _WS_SPLIT_RE.split(raw_query.lower())
        if w and w not in STOP_WORDS
    ]
