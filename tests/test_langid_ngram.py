"""Char-n-gram language ID (VERDICT r2 next-round item 4).

Labeled one-sentence samples per language (held out from the stoplist
training data), accuracy floor pinned, plus the strict
(discard-on-unknown, py3langid-installed) gate semantics behind
Options.lang_strict.  The accuracy table rendered from LABELED_SAMPLES
lives in COVERAGE.md."""

from trafilatura_spark.kernel import Options, bare_extract
from trafilatura_spark.kernel.langid import classify_language, language_filter
from trafilatura_spark.kernel.langprofiles import LANG_PROFILES, classify_ngram

LABELED_SAMPLES = {
    "en": "The committee announced that the new policy will take effect next month, and officials said they expect broad support from the public.",
    "de": "Die Regierung hat angekündigt, dass die neuen Maßnahmen im kommenden Monat in Kraft treten werden, und viele Bürger begrüßen diese Entscheidung.",
    "fr": "Le gouvernement a annoncé que les nouvelles mesures entreront en vigueur le mois prochain et que les citoyens seront informés rapidement.",
    "es": "El gobierno anunció que las nuevas medidas entrarán en vigor el próximo mes y que los ciudadanos serán informados con antelación.",
    "it": "Il governo ha annunciato che le nuove misure entreranno in vigore il mese prossimo e che i cittadini saranno informati per tempo.",
    "pt": "O governo anunciou que as novas medidas entrarão em vigor no próximo mês e que os cidadãos serão informados com antecedência.",
    "nl": "De regering heeft aangekondigd dat de nieuwe maatregelen volgende maand van kracht worden en dat de burgers tijdig worden geïnformeerd.",
    "pl": "Rząd ogłosił, że nowe przepisy wejdą w życie w przyszłym miesiącu, a obywatele zostaną o tym wcześniej poinformowani.",
    "cs": "Vláda oznámila, že nová opatření vstoupí v platnost příští měsíc a že občané budou včas informováni o všech změnách.",
    "ru": "Правительство объявило, что новые меры вступят в силу в следующем месяце, и граждане будут заранее проинформированы об этом.",
    "uk": "Уряд оголосив, що нові заходи набудуть чинності наступного місяця, і громадяни будуть завчасно поінформовані про це.",
    "bg": "Правителството обяви, че новите мерки ще влязат в сила следващия месец и гражданите ще бъдат уведомени предварително.",
    "ar": "أعلنت الحكومة أن الإجراءات الجديدة ستدخل حيز التنفيذ الشهر المقبل وأن المواطنين سيتم إبلاغهم مسبقا بكل التفاصيل.",
    "he": "הממשלה הודיעה כי הצעדים החדשים ייכנסו לתוקף בחודש הבא וכי האזרחים יקבלו הודעה מראש על כל הפרטים.",
    "el": "Η κυβέρνηση ανακοίνωσε ότι τα νέα μέτρα θα τεθούν σε ισχύ τον επόμενο μήνα και ότι οι πολίτες θα ενημερωθούν εγκαίρως.",
    "hi": "सरकार ने घोषणा की कि नए नियम अगले महीने से लागू होंगे और नागरिकों को पहले से सूचित किया जाएगा।",
    "fa": "دولت اعلام کرد که اقدامات جدید از ماه آینده اجرا خواهد شد و شهروندان از قبل در جریان همه جزئیات قرار خواهند گرفت.",
    "ta": "புதிய நடவடிக்கைகள் அடுத்த மாதம் முதல் அமலுக்கு வரும் என்றும் குடிமக்களுக்கு முன்கூட்டியே தெரிவிக்கப்படும் என்றும் அரசு அறிவித்தது.",
    "zh": "政府宣布新的措施将于下个月生效，并表示公民将提前收到有关所有细节的通知。",
    "ja": "政府は新しい措置が来月から施行されると発表し、市民には事前にすべての詳細が通知されると述べました。",
    "ko": "정부는 새로운 조치가 다음 달부터 시행될 것이라고 발표했으며 시민들에게 사전에 모든 세부 사항이 통지될 것이라고 말했습니다.",
    "th": "รัฐบาลประกาศว่ามาตรการใหม่จะมีผลบังคับใช้ในเดือนหน้า และประชาชนจะได้รับแจ้งรายละเอียดทั้งหมดล่วงหน้า",
    "tr": "Hükümet yeni önlemlerin önümüzdeki ay yürürlüğe gireceğini ve vatandaşların önceden bilgilendirileceğini açıkladı.",
    "fi": "Hallitus ilmoitti, että uudet toimenpiteet tulevat voimaan ensi kuussa ja että kansalaisille tiedotetaan asiasta hyvissä ajoin.",
    "hu": "A kormány bejelentette, hogy az új intézkedések a jövő hónapban lépnek hatályba, és a polgárokat előre tájékoztatják.",
    "sv": "Regeringen meddelade att de nya åtgärderna träder i kraft nästa månad och att medborgarna kommer att informeras i god tid.",
    "da": "Regeringen meddelte, at de nye tiltag træder i kraft næste måned, og at borgerne vil blive informeret i god tid.",
    "ro": "Guvernul a anunțat că noile măsuri vor intra în vigoare luna viitoare și că cetățenii vor fi informați din timp.",
    "vi": "Chính phủ thông báo rằng các biện pháp mới sẽ có hiệu lực vào tháng tới và người dân sẽ được thông báo trước về mọi chi tiết.",
    "id": "Pemerintah mengumumkan bahwa langkah-langkah baru akan mulai berlaku bulan depan dan warga akan diberi tahu sebelumnya.",
    # Indic-script breadth incl. the same-script Devanagari trio (hi/mr/ne)
    "te": "ప్రభుత్వం కొత్త చర్యలు వచ్చే నెల నుండి అమలులోకి వస్తాయని ప్రకటించింది మరియు పౌరులకు ముందుగానే అన్ని వివరాలు తెలియజేయబడతాయి.",
    "ml": "പുതിയ നടപടികൾ അടുത്ത മാസം മുതൽ പ്രാബല്യത്തിൽ വരുമെന്നും പൗരന്മാരെ മുൻകൂട്ടി എല്ലാ വിവരങ്ങളും അറിയിക്കുമെന്നും സർക്കാർ പ്രഖ്യാപിച്ചു.",
    "kn": "ಹೊಸ ಕ್ರಮಗಳು ಮುಂದಿನ ತಿಂಗಳಿಂದ ಜಾರಿಗೆ ಬರಲಿವೆ ಮತ್ತು ನಾಗರಿಕರಿಗೆ ಮೊದಲೇ ಎಲ್ಲಾ ವಿವರಗಳನ್ನು ತಿಳಿಸಲಾಗುವುದು ಎಂದು ಸರ್ಕಾರ ಪ್ರಕಟಿಸಿದೆ.",
    "gu": "સરકારે જાહેર કર્યું કે નવા પગલાં આવતા મહિનાથી અમલમાં આવશે અને નાગરિકોને પહેલેથી બધી વિગતો જણાવવામાં આવશે.",
    "ne": "नयाँ उपायहरू अर्को महिनादेखि लागू हुनेछन् र नागरिकहरूलाई सबै विवरणहरू पहिले नै जानकारी गराइनेछ भनेर सरकारले घोषणा गर्यो।",
    "mr": "नवीन उपाय पुढील महिन्यापासून लागू होतील आणि नागरिकांना सर्व तपशील आधीच कळवले जातील असे सरकारने जाहीर केले.",
    "bn": "সরকার ঘোষণা করেছে যে নতুন ব্যবস্থা আগামী মাস থেকে কার্যকর হবে এবং নাগরিকদের আগে থেকেই সব বিবরণ জানানো হবে।",
}


def test_profile_breadth():
    assert len(LANG_PROFILES) >= 50


def test_labeled_sample_accuracy():
    """Every one of the 30 held-out samples must classify correctly —
    the function-word tie-break resolves the close Romance/Nordic pairs
    the raw n-gram distance confuses (es/it, da/no)."""
    wrong = {
        lang: classify_language(s)
        for lang, s in LABELED_SAMPLES.items()
        if classify_language(s) != lang
    }
    assert not wrong, wrong


def test_strict_mode_always_labels():
    "py3langid-installed semantics: argmax label even on thin evidence."
    assert classify_language("zzz qqq xxx", strict=True) is not None
    assert classify_language("zzz qqq xxx") is None  # default stays unknown
    assert classify_language("", strict=True) is None  # letterless only


def test_language_filter_strict_discards_unknown():
    junk = "qq zz xx vv kk pp 123 456"
    assert language_filter(junk, "", "de", strict=True) is True
    assert language_filter(junk, "", "de", strict=False) is False


def test_language_filter_strict_keeps_letterless():
    """Round-3 ADVICE: letterless input yields no label at all; strict
    mode must treat that as no evidence (py3langid would emit an
    arbitrary low-confidence label here), never a positive mismatch."""
    for junk in ("", "   ", "1234 5678 !!", "... --- %%% 42"):
        assert language_filter(junk, "", "en", strict=True) is False
        assert language_filter(junk, "", "en", strict=False) is False
    # real mismatches still discard in both modes
    de = "Der Hund und die Katze sind nicht mit dem Auto gefahren, aber sie werden bald ankommen."
    assert language_filter(de, "", "en", strict=True) is True
    assert language_filter(de, "", "en", strict=False) is True


def test_lang_strict_option_gates_extraction():
    doc = (
        "<html><body><article><p>Zzz qq xx vv kk pp brr grmbl frpt wuzzle snark "
        "blorft quux zibber zabber frobnitz grelb vrook plonk snerd wibble.</p>"
        "</article></body></html>"
    )
    lenient = Options(lang="de", min_extracted_size=0)
    strict = Options(lang="de", lang_strict=True, min_extracted_size=0)
    kept = bare_extract(doc, lenient)
    assert kept.text is not None  # unknown never discards by default
    dropped = bare_extract(doc, strict)
    assert dropped.text is None and dropped.tier == "wrong_language"


def test_ngram_margin_exposed():
    best, second, dist, margin = classify_ngram(LABELED_SAMPLES["el"])
    assert best == "el" and 0 <= dist <= 1 and margin > 0 and second != "el"


def test_langid_fixture_parquet_pins_classifier_outputs():
    """The committed fixture parquet (tools/gen_langid_fixture.py) must
    reproduce the LIVE classifier byte-for-byte — this is the value
    oracle behind text_lang_id_ngram.  A mismatch means the classifier
    changed without regenerating the fixture (intentional changes rerun
    the tool; unintentional ones are regressions)."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    from trafilatura_spark.kernel.langid import classify_language

    path = os.path.join(os.path.dirname(__file__), "fixtures", "langid_expected.parquet")
    table = pq.read_table(path)
    pinned = dict(zip(table.column("text_md5").to_pylist(),
                      table.column("pred_lang").to_pylist()))
    assert len(pinned) > 500

    import pyarrow.dataset as ds
    docs = ds.dataset("/root/testdata/sf0.001/documents.parquet").to_table(
        columns=["text"]).column("text").to_pylist()
    assert len(docs) > 0
    for text in docs:
        key = hashlib.md5(text.encode("utf-8")).hexdigest()
        assert key in pinned, "fixture must cover every sf0.001 text"
        assert classify_language(text) == pinned[key]
