"""jusText-style paragraph classifier (second fallback).

From-scratch implementation of the jusText boilerplate-removal method
(Pomikálek 2011, public): segment the DOM into paragraphs at block-tag
boundaries, classify context-free by stop-word density / link density /
length, then revise context-sensitively by neighbor classes.

The reference calls the justext package with fixed parameters
(/root/reference/trafilatura/external.py:134-139: length_low=50,
length_high=150, stopwords_low=0.1, stopwords_high=0.2,
max_link_density=0.25, no_headings=True; revise distance 150) over a
merged all-language stoplist.  The justext data files are not available
here, so a built-in function-word stoplist covering major European
languages is used instead; the classification machinery is parameter-
compatible.
"""

from __future__ import annotations

import re
from typing import Optional

from .dom import Element

PARAGRAPH_TAGS = frozenset(
    "blockquote caption center col colgroup dd div dl dt fieldset form h1 h2 h3 h4 h5 h6 "
    "legend li optgroup option p pre table td textarea tfoot th thead tr ul ol".split()
)
HEADING_RE = re.compile(r"\bh\d\b")
SELECT_PATH_RE = re.compile(r"(^select|\.select)")
PREPROC_REMOVE = frozenset({"head", "script", "style"})

# Built-in function-word stoplists per language (justext data files are
# unavailable here).  The reference merges ALL justext stoplists into
# one set by default (external.py:124-131) and switches to the single
# language-specific stoplist when target_language is set
# (external.py:146-150) — both behaviors are reproduced from this dict.
LANG_STOPLISTS = {
    "en": """
the of and a to in is you that it he was for on are as with his they i at be this have from or one
had by word but not what all were we when your can said there use an each which she do how their if
will up other about out many then them these so some her would make like him into time has look two
more write go see number no way could people my than first water been call who oil its now find long
down day did get come made may part over new sound take only little work know place year live me back
give most very after thing our just name good sentence man think say great where help through much
before line right too mean old any same tell boy follow came want show also around form three small
set put end does another well large must big even such because turn here why ask went men read need
land different home us move try kind hand picture again change off play spell air away animal house
point page letter mother answer found study still learn should america world
""",
    "de": """
der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden
aus er hat dass sie nach wird bei einer um am sind noch wie einem über einen so zum war haben nur
oder aber vor zur bis mehr durch man sein wurde sei während können ihre dann unter wir soll ich
eines jahr zwei diese wieder keine ihrer seiner alle würde diesem gegen beim selbst jedoch wenn
ihren schon dieser seine damit müssen welche
""",
    "fr": """
le de la et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il sont son
avec comme ont être mais fait aux ses était ou nous sans ces dont elle deux même leur tout après
avait bien où entre ans peut cette là ils encore mes ainsi été moins très votre
""",
    "es": """
el la de que y a en un ser se no haber por con su para como estar tener le lo todo pero más hacer
o poder decir este ir otro ese si me ya ver porque dar cuando muy sin vez mucho saber qué sobre mi
alguno mismo también hasta año dos querer entre así primero desde grande eso ni nos llegar
""",
    "it": """
di e il che la per un in una sono mi si lo ma ha le con non più come io questo qui hai del tu
ci era lei nel anche perché sei ti quando ho bene cosa sia mia molto
""",
    "pt": """
de a o que e do da em um para é com não uma os no se na por mais as dos como mas foi ao ele das
tem à seu sua ou ser quando muito há nos já está eu também só pelo pela até isso ela entre era
depois sem mesmo aos ter seus quem nas me esse eles estão você tinha foram essa num nem suas meu
""",
    "nl": """
de het een en van ik te dat die in je hij zijn is was op aan met als voor had er maar om hem dan
zou of wat mijn men dit zo door over ze zich bij ook tot uit naar heeft hebben deze niet nog zal
toen nu haar daar onder tegen na reeds wel waar wordt
""",
    "pl": """
i w się na nie z że do to jest jak po co tak o ale jego za od przez już tylko czy ich może być
przy bardzo są było dla której kiedy go tym mnie jestem będzie nawet ją tego jednak sobie temu
można gdy nas takie wszystko jeszcze oraz który została przede wszystkim
""",
    "cs": """
a se na je v že s z k ale i pro tak po co když už jen podle další jeho bude nebo byl být má
při také za před mezi která které který aby však ještě až bylo byla můžete této od není jsou
jsme tím jako o do
""",
    "sv": """
och i att det som en på är av för med till den har de inte om ett han men var jag sig från vi
så kan man när år under också ut efter skulle sina mot där eller vad hade honom bara blir
mycket nu över sin vid kommer
""",
    "da": """
og i at det er en til de som på med han af for ikke der var mig sig men et har om vi min havde
ham hun nu over da fra du ud sin dem os op man hans hvor eller hvad skal selv her alle vil blev
kunne ind når være
""",
    "no": """
og i at det er en til de som på med han var for ikke der et har om du jeg kan vi så
å være ble eller hva meg noe hadde ikkje etter også
""",
    "fi": """
ja on ei se että oli hän ovat mutta olen sen kun niin kuin myös jo hänen sitä tai vain joka
mitä minä me he tässä tämä ole kanssa mukaan jos nyt vielä voi kaikki siitä ollut olla sekä
näin koska jonka heidän
""",
    "hu": """
a az és hogy nem is egy ez volt de meg csak már el vagy ha mint még azt aki ki mert úgy nagyon
lehet ezt olyan amikor vele ami után lesz kell pedig ők én te ti azok ezek minden sok más jól
itt ott
""",
    "ro": """
și de a în la cu pe că este nu o un se din mai sau dacă care pentru sunt fost lui ei el ea noi
dar după când avea acest această fără între prin unde cum toate fiecare acum foarte apoi doar
două fel ceva fie
""",
    "tr": """
bir ve bu da ne için çok ile daha o ben sen biz siz onlar ama gibi en az var yok değil ki diye
sonra kadar her şey onun bana beni benim sana seni ancak veya hem ise olarak olan oldu olduğu
üzere göre karşı bütün
""",
    "id": """
yang dan di itu dengan untuk tidak ini dari dalam akan pada juga saya kita ke ada mereka dia
anda bisa oleh telah sudah atau seperti karena jika saat harus bagi tentang lebih satu dua
bahwa tersebut namun masih setelah hanya para kami
""",
    "ru": """
и в не на я что он с как это по но они мы она к у же вы за бы от то все так его было ее мне
есть был для о еще нет них кто при да когда даже ну если или него вот только уже меня
""",
}
LANG_STOPLISTS = {lang: frozenset(w.lower() for w in words.split()) for lang, words in LANG_STOPLISTS.items()}

MERGED_STOPLIST = frozenset().union(*LANG_STOPLISTS.values())


class Paragraph:
    __slots__ = ("dom_path", "text_nodes", "chars_count_in_links", "tags_count", "cf_class", "class_")

    def __init__(self, path: str):
        self.dom_path = path
        self.text_nodes: list = []
        self.chars_count_in_links = 0
        self.tags_count = 0
        self.cf_class: Optional[str] = None
        self.class_: Optional[str] = None

    @property
    def text(self) -> str:
        return re.sub(r"\s+", " ", "".join(self.text_nodes)).strip()

    @property
    def words(self) -> list:
        return self.text.split()

    @property
    def heading(self) -> bool:
        return bool(HEADING_RE.search(self.dom_path))

    def links_density(self) -> float:
        length = len(self.text)
        if not length:
            return 0.0
        return self.chars_count_in_links / length

    def stopwords_density(self, stoplist) -> float:
        words = self.words
        if not words:
            return 0.0
        return sum(1 for w in words if w.lower() in stoplist) / len(words)


def make_paragraphs(tree: Element) -> list:
    "Segment a DOM into paragraphs at block-tag boundaries."
    paragraphs: list = []
    path: list = []
    current = [Paragraph("")]
    link_depth = [0]
    br_run = [0]

    def start_paragraph() -> None:
        if current[0].text_nodes and current[0].text:
            paragraphs.append(current[0])
        current[0] = Paragraph(".".join(path))

    def add_text(text: Optional[str]) -> None:
        if not text:
            return
        if text.strip():
            br_run[0] = 0
        current[0].text_nodes.append(text)
        if link_depth[0] > 0:
            current[0].chars_count_in_links += len(text)

    def walk(el: Element) -> None:
        tag = el.tag
        if tag in PREPROC_REMOVE:
            return
        is_block = tag in PARAGRAPH_TAGS
        if tag == "br":
            br_run[0] += 1
            if br_run[0] >= 2:
                start_paragraph()
        elif is_block:
            path.append(tag)
            start_paragraph()
        if tag == "a":
            link_depth[0] += 1
            current[0].tags_count += 1
        add_text(el.text)
        for child in el:
            walk(child)
            add_text(child.tail)
        if tag == "a":
            link_depth[0] -= 1
        if is_block:
            start_paragraph()
            path.pop()

    walk(tree)
    if current[0].text_nodes and current[0].text:
        paragraphs.append(current[0])
    return paragraphs


def classify_paragraphs(
    paragraphs: list,
    stoplist,
    length_low: int = 50,
    length_high: int = 150,
    stopwords_low: float = 0.1,
    stopwords_high: float = 0.2,
    max_link_density: float = 0.25,
    no_headings: bool = True,
) -> None:
    "Context-free classification."
    for paragraph in paragraphs:
        text = paragraph.text
        length = len(text)
        stopword_density = paragraph.stopwords_density(stoplist)
        link_density = paragraph.links_density()

        if link_density > max_link_density:
            paragraph.cf_class = "bad"
        elif "\xa9" in text or "&copy" in text:
            paragraph.cf_class = "bad"
        elif SELECT_PATH_RE.search(paragraph.dom_path):
            paragraph.cf_class = "bad"
        elif length < length_low:
            paragraph.cf_class = "bad" if paragraph.chars_count_in_links > 0 else "short"
        elif stopword_density >= stopwords_high:
            paragraph.cf_class = "good" if length > length_high else "neargood"
        elif stopword_density >= stopwords_low:
            paragraph.cf_class = "neargood"
        else:
            paragraph.cf_class = "bad"


def _get_neighbour(i: int, paragraphs: list, ignore_neargood: bool, inc: int, boundary: int) -> str:
    while i + inc != boundary:
        i += inc
        c = paragraphs[i].class_
        if c in ("good", "bad"):
            return c
        if c == "neargood" and not ignore_neargood:
            return c
    return "bad"


def _prev_neighbour(i: int, paragraphs: list, ignore_neargood: bool) -> str:
    return _get_neighbour(i, paragraphs, ignore_neargood, -1, -1)


def _next_neighbour(i: int, paragraphs: list, ignore_neargood: bool) -> str:
    return _get_neighbour(i, paragraphs, ignore_neargood, 1, len(paragraphs))


def revise_paragraph_classification(paragraphs: list, max_heading_distance: int = 150) -> None:
    "Context-sensitive revision."
    for paragraph in paragraphs:
        paragraph.class_ = paragraph.cf_class

    # good headings
    for i, paragraph in enumerate(paragraphs):
        if not (paragraph.heading and paragraph.class_ == "short"):
            continue
        j = i + 1
        distance = 0
        while j < len(paragraphs) and distance <= max_heading_distance:
            if paragraphs[j].class_ == "good":
                paragraph.class_ = "neargood"
                break
            distance += len(paragraphs[j].text)
            j += 1

    # classify short
    new_classes = {}
    for i, paragraph in enumerate(paragraphs):
        if paragraph.class_ != "short":
            continue
        prev = _prev_neighbour(i, paragraphs, ignore_neargood=True)
        nxt = _next_neighbour(i, paragraphs, ignore_neargood=True)
        neighbours = {prev, nxt}
        if neighbours == {"good"}:
            new_classes[i] = "good"
        elif neighbours == {"bad"}:
            new_classes[i] = "bad"
        elif (prev == "bad" and _prev_neighbour(i, paragraphs, ignore_neargood=False) == "neargood") or (
            nxt == "bad" and _next_neighbour(i, paragraphs, ignore_neargood=False) == "neargood"
        ):
            new_classes[i] = "good"
        else:
            new_classes[i] = "bad"
    for i, c in new_classes.items():
        paragraphs[i].class_ = c

    # revise neargood
    for i, paragraph in enumerate(paragraphs):
        if paragraph.class_ != "neargood":
            continue
        prev = _prev_neighbour(i, paragraphs, ignore_neargood=True)
        nxt = _next_neighbour(i, paragraphs, ignore_neargood=True)
        paragraph.class_ = "bad" if (prev, nxt) == ("bad", "bad") else "good"

    # more good headings
    for i, paragraph in enumerate(paragraphs):
        if not (paragraph.heading and paragraph.class_ == "bad" and paragraph.cf_class != "bad"):
            continue
        j = i + 1
        distance = 0
        while j < len(paragraphs) and distance < max_heading_distance:
            if paragraphs[j].class_ == "good":
                paragraph.class_ = "good"
                break
            distance += len(paragraphs[j].text)
            j += 1


def custom_justext(tree: Element, stoplist=MERGED_STOPLIST) -> list:
    "jusText with the reference's fixed parameters (external.py:134-139)."
    paragraphs = make_paragraphs(tree)
    classify_paragraphs(paragraphs, stoplist, 50, 150, 0.1, 0.2, 0.25, True)
    revise_paragraph_classification(paragraphs, 150)
    return paragraphs


def try_justext(tree: Element, url: Optional[str], target_language: Optional[str]) -> Element:
    """Second safety net (external.py:142-163).  With a known
    target_language the language-specific stoplist is used
    (external.py:146-150); otherwise the merged all-language set."""
    result_body = Element("body")
    stoplist = LANG_STOPLISTS.get(target_language or "", MERGED_STOPLIST)
    try:
        paragraphs = custom_justext(tree, stoplist)
    except Exception:
        return result_body
    for paragraph in paragraphs:
        if paragraph.class_ != "good":
            continue
        elem = Element("p")
        elem.text = paragraph.text
        result_body.append(elem)
    return result_body
