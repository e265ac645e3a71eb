"""Per-language function-word stoplists for the jusText-style classifier.

The reference merges ALL justext stoplists (~50 languages) into one set
by default (/root/reference/trafilatura/external.py:124-131) and
switches to the single language-specific list when target_language is
set (external.py:146-150).  The justext data files are not available in
this environment (no pip), so these lists are built-in function-word
vocabularies written from public linguistic knowledge — high-frequency
closed-class words (articles, particles, pronouns, prepositions,
auxiliaries) per language, the same word class justext's
Wikipedia-derived lists are dominated by.

Two tokenization regimes:

- ``LANG_STOPLISTS`` — token-mode languages (whitespace-delimited
  scripts): density = stopword tokens / all tokens, as in justext.
- ``NOSPACE_STOPLISTS`` — scripts written without spaces (zh, ja, th)
  plus Korean (spaces exist but particles agglutinate onto content
  words, so exact-token matching fails): density = characters covered
  by stopword substring matches / non-space characters.  justext itself
  has no CJK support; this regime is the from-scratch extension that
  makes the classifier meaningful on those scripts.
"""

from __future__ import annotations

import re
from functools import lru_cache

# --- token-mode languages ----------------------------------------------------

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
    "sk": """
a sa na je v že s z k ale i pre tak po čo keď už len podľa ďalší jeho bude alebo bol byť má
pri tiež za pred medzi ktorá ktoré ktorý aby však ešte až bolo bola od nie sú sme ako o do
môže túto tejto
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
    "is": """
og að í á það er ekki ég þú við þið þeir þær hún hann en eða ef eins þegar hvar hvað allt
hans minn þinn mjög enn aðeins hér þar var verður eftir fyrir án milli um til með sem hefur
voru þetta þessi
""",
    "fi": """
ja on ei se että oli hän ovat mutta olen sen kun niin kuin myös jo hänen sitä tai vain joka
mitä minä me he tässä tämä ole kanssa mukaan jos nyt vielä voi kaikki siitä ollut olla sekä
näin koska jonka heidän
""",
    "et": """
ja on ei see et oli ta nad aga meie teie nagu ka kui siis veel ainult juba või kus kes kõik
oma nii väga pärast enne kuni ilma iga siin seal ning mis ole olla tema selle olid seda mida
kuid välja üle
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
    "az": """
və bu bir də ki ilə üçün o mən sən biz siz onlar amma kimi ən az var yox deyil sonra qədər
hər şey onun mənə məni olaraq olan oldu görə qarşı bütün daha çox ancaq əgər nə necə harada
""",
    "kk": """
және бұл бір де бар үшін ол мен сен біз сіз олар бірақ сияқты ең аз жоқ емес кейін дейін
әр нәрсе оның маған мені болып болған болды бойынша қарсы барлық та не егер қалай қайда
осы сол арқылы туралы
""",
    "id": """
yang dan di itu dengan untuk tidak ini dari dalam akan pada juga saya kita ke ada mereka dia
anda bisa oleh telah sudah atau seperti karena jika saat harus bagi tentang lebih satu dua
bahwa tersebut namun masih setelah hanya para kami
""",
    "ms": """
yang dan di itu dengan untuk tidak ini dari dalam akan pada juga saya kita ke ada mereka dia
anda boleh oleh telah sudah atau seperti kerana jika apabila harus bagi tentang lebih satu dua
bahawa tersebut namun masih selepas hanya para kami ialah adalah
""",
    "tl": """
ang ng sa na at ay mga ako ikaw siya kami kayo sila ito iyan iyon hindi oo din rin naman lang
kung kapag dahil para tungkol lahat wala may mayroon pa ba daw raw po ko mo niya namin natin
nila akin iyo kanya
""",
    "vi": """
và của là có trong được cho không một người này với các những để đã khi trên về như đến từ
ra còn thì cũng sẽ bị vào nhưng phải nhiều hơn rất nên tại sau theo đó ông bà tôi chúng ta
anh em họ nó ai gì đây kia
""",
    "ru": """
и в не на я что он с как это по но они мы она к у же вы за бы от то все так его было ее мне
есть был для о еще нет них кто при да когда даже ну если или него вот только уже меня
""",
    "uk": """
і в не на я що він з як це по але вони ми вона до у же ви за від то всі так його було її мені
є був для про ще немає хто при коли навіть якщо або тільки вже мене цей та цього який яка
може бути
""",
    "be": """
і ў не на я што ён з як гэта па але яны мы яна да у жа вы за ад то ўсе так яго было яе мне
ёсць быў для пра яшчэ няма хто пры калі нават або толькі ўжо мяне гэты ды які можа быць
""",
    "bg": """
и в не на аз че той с как това по но те ние тя към у вие за от то всички така него беше ми
е бил още няма кой при когато дори ако или само вече ме да се са като който която което
ще има
""",
    "sr": """
и у не на да је се што он са како то по али они ми она код ви за од су тако њега било био
још нема ко при када чак ако или само већ ме ово та који која које може бити ће има
""",
    "hr": """
i u ne na da je se što on sa kako to po ali oni mi ona kod vi za od su tako njega bilo bio
još nema tko pri kada čak ako ili samo već me ovo ta koji koja koje može biti će ima
""",
    "sl": """
in je v na se za da so z bi ki pa po ne bil s tudi kot le od lahko bo ali pri še vendar kar
tako kjer med brez čez zelo že njegov njen moj ta to ima biti bila bilo smo ste
""",
    "mk": """
и во не на јас што тој со како тоа по но тие ние таа кон у вие за од то сите така него беше
ми е бил уште нема кој при кога дури ако или само веќе ме да се се кој која кое ќе има
""",
    "sq": """
dhe të në një që për me nga është i e u si ka do jo por ose kur ku çfarë ne ju ata ajo ai
shumë më pak deri pa midis pas para këtu atje ishte janë kjo ky jam je jemi jeni
""",
    "el": """
και το να της από τον την με που δεν ο η οι τα των στο στη στην για ως είναι ήταν αυτό αυτή
αυτός αλλά αν θα έχει είχε πολύ όπως μια ένα έναν κατά μετά πριν μέχρι χωρίς κάθε όλα εδώ
εκεί τους τις σε και μας σας δε
""",
    "lt": """
ir yra į kad su iš ne tai bet kaip o jis ji mes jūs jie už per apie po prie nuo iki buvo
būti gali labai dar tik jau arba bei kur kai visi savo taip pat šis ši tas ta
""",
    "lv": """
un ir uz ka ar no ne tas bet kā viņš viņa mēs jūs viņi par pēc pie līdz bija būt var ļoti
vēl tikai jau vai kur kad visi savs tā šis arī kas to tie tās
""",
    "ka": """
და არის არ რომ ის ეს მე შენ ჩვენ თქვენ ისინი მაგრამ ან თუ როგორც როდესაც სად რა ყველა მისი
ჩემი შენი ძალიან კიდევ მხოლოდ უკვე აქ იქ იყო იქნება შემდეგ წინ გარეშე ამ იმ თავისი მას
""",
    "hy": """
և է այս որ նա ես դու մենք դուք նրանք բայց կամ եթե ինչպես երբ որտեղ ինչ բոլորը նրա իմ քո
շատ դեռ միայն արդեն այստեղ այնտեղ էր կլինի հետո առաջ առանց մի են ու այն որը
""",
    "ar": """
في من على أن إلى عن مع هذا هذه ذلك التي الذي ما لا لم لن هو هي هم أو ثم حتى إذا كان كانت
يكون قد كل بعد قبل بين عند غير أي لكن كما منذ حيث هناك نحن أنا أنت أيضا ليس بل عليه فيه
منه لها له بها به هنا وقد وهو وهي
""",
    "he": """
של את על לא זה עם הוא היא אני אתה הם כי מה יש אין גם רק אבל או אם כאשר היה הייתה להיות כל
יותר מאוד אחד שני כמו בין אחרי לפני עד מן אל זאת אלה אשר כך שם פה עוד אותו אותה שלו שלה שלי
כדי זהו אלו הזה הזאת כפי לגבי בגלל למרות אחר כן אז הרבה כבר עכשיו שלנו שלהם מי איך למה איפה
""",
    "fa": """
و در به از که این را با است برای آن یک خود تا بر ها می شد شده بود های او ما شما آنها اما
اگر هم نیز یا هر چه بی پس مورد باید کرد کند شود هستند بودند
""",
    "ur": """
کے کی کا میں ہے کو سے اور پر یہ وہ کہ نے ایک ہیں تھا تھی بھی نہیں تو ہی کر کیا جب تک ساتھ
بعد لیے اپنے اس اب یا پھر بہت رہا کہا ان ہم آپ گیا گئی ہوئے ہو گا گے
""",
    "hi": """
का के की में है को से और पर यह वह कि ने एक हैं था थी थे भी नहीं तो ही कर किया करने हो गया
जब तक साथ बाद लिए अपने उनके इसके कुछ इस उस अब या फिर बहुत सकता सकते रहा रही कहा होता होती
""",
    "bn": """
এই যে এবং না করে থেকে তার জন্য একটি সঙ্গে হয় ছিল তিনি আমি তুমি আমরা তারা কিন্তু আরও অনেক
যা কি কোন এক দুই হবে হয়ে বলে পরে আগে মধ্যে দিয়ে নিয়ে কাছে আছে নেই সব আর ও এর করা হয়েছে
""",
    "mr": """
आणि हे ते की मी तू आम्ही तुम्ही तो ती पण किंवा जर जसे जेव्हा कुठे काय सर्व त्याचा माझा तुझा
खूप अजून फक्त आधीच इथे तिथे होते आहे नंतर आधी शिवाय एक आहेत या च्या ला ने मध्ये वर आला आली
""",
    "ta": """
மற்றும் இந்த அந்த ஒரு என்று அது இது நான் நீ நாம் அவர் அவள் அவர்கள் ஆனால் அல்லது என எனக்கு
உள்ள இல்லை இருந்து வரை மிகவும் இன்னும் மட்டும் ஏற்கனவே இங்கே அங்கே இருந்தது பின்னர் முன்
இல்லாமல் மேலும் என்ன எப்படி எங்கே ஆகும் ஆக
""",
    "te": """
మరియు ఈ ఆ ఒక అని అది ఇది నేను నీవు మేము వారు కానీ లేదా కోసం లో నుండి వరకు చాలా ఇంకా
మాత్రమే ఇప్పటికే ఇక్కడ అక్కడ ఉంది ఉన్నాయి తరువాత ముందు లేకుండా కూడా ఏమి ఎలా ఎక్కడ
అవుతుంది గా పై తో కాదు అన్ని
""",
    "ml": """
ഒരു ഈ ആ എന്ന് അത് ഇത് ഞാൻ നീ നമ്മൾ അവർ പക്ഷേ അല്ലെങ്കിൽ വേണ്ടി ൽ നിന്ന് വരെ വളരെ
ഇനിയും മാത്രം ഇതിനകം ഇവിടെ അവിടെ ഉണ്ട് ആയിരുന്നു ശേഷം മുമ്പ് ഇല്ലാതെ കൂടാതെ എന്ത്
എങ്ങനെ എവിടെ ആണ് അല്ല എല്ലാ ഉം ഒപ്പം
""",
    "kn": """
ಮತ್ತು ಈ ಆ ಒಂದು ಎಂದು ಅದು ಇದು ನಾನು ನೀನು ನಾವು ಅವರು ಆದರೆ ಅಥವಾ ಗಾಗಿ ನಲ್ಲಿ ಇಂದ ವರೆಗೆ ತುಂಬಾ
ಇನ್ನೂ ಮಾತ್ರ ಈಗಾಗಲೇ ಇಲ್ಲಿ ಅಲ್ಲಿ ಇದೆ ಇತ್ತು ನಂತರ ಮೊದಲು ಇಲ್ಲದೆ ಸಹ ಏನು ಹೇಗೆ ಎಲ್ಲಿ ಆಗಿದೆ
ಅಲ್ಲ ಎಲ್ಲಾ ಕೂಡ
""",
    "gu": """
અને આ તે એક કે છે હતું હું તું અમે તેઓ પણ અથવા માટે માં થી સુધી ખૂબ હજી માત્ર પહેલેથી
અહીં ત્યાં પછી પહેલાં વગર શું કેવી ક્યાં છું હતા નથી બધા સાથે પર જે જેમ
""",
    "ne": """
र यो त्यो एउटा भनेर यसले म तिमी हामी उनीहरू तर वा लागि मा बाट सम्म धेरै अझै मात्र पहिले
यहाँ त्यहाँ छ थियो पछि अगाडि बिना के कसरी कहाँ हो होइन सबै साथ छन् गरेको गर्न भने पनि
""",
    "sw": """
na ya wa kwa ni za katika la cha hii hiyo huo ile kama lakini au ambayo wake wangu wao sisi
wewe yeye kuwa alikuwa ana hana kila sana zaidi tu bado hapa pale baada kabla bila kati yake
pia hata hivyo
""",
    "af": """
en die van in is nie het dat om op vir met ek jy ons julle hulle sy maar of as soos wanneer
waar wat alles my jou baie nog net reeds hier daar was sal na voor sonder tussen aan deur
hierdie daardie word
""",
    "ca": """
i de la el que a en un per amb no és els les una al del més ho aquest com si ja o molt
també hi ha va ser està han però fins des sense entre quan on tot seva seu aquesta això
""",
    "eu": """
eta da ez du bat en zen dira izan ere baina edo hau hori zer nola non zergatik gure zure
bere gu zu haiek asko oso gehiago baino arte gabe artean ondoren aurretik hemen han zuen
dute duen dela
""",
}

# --- no-space-script languages (substring/coverage density) -------------------

NOSPACE_STOPLISTS = {
    "zh": """
的 了 是 在 和 有 我 他 她 它 们 这 那 不 也 就 都 而 及 与 或 但 被 从 到 对 会 能 可以 没有
我们 你们 他们 因为 所以 如果 虽然 这个 那个 什么 怎么 还是 已经 可能 应该 于 之 其 中 为 以
很 最 更 要 说 着 过 吗 呢 啊 个 将 并 让 向 给 把 比 如 又 再 只 才 等 里 后 前 时
""",
    "ja": """
の に は を た が で て と し れ さ ある いる も する から な こと として い や など なっ ない
この ため その あっ よう また もの という あり まで られ なる へ か だ これ によって により
おり より による ず なり られる において ば なかっ なく しかし について せ だっ できる それ
ください ます です でした ません
""",
    "th": """
ที่ การ และ ใน เป็น มี ของ ได้ ให้ ว่า จะ ไม่ ไป มา กับ แต่ หรือ ก็ เมื่อ ความ โดย อยู่ คน
ซึ่ง แล้ว ต้อง นี้ นั้น จาก ถึง ด้วย อย่าง เขา เรา คุณ ฉัน มัน พวก ยัง เพราะ ถ้า ทำ ดี มาก
กว่า ที่สุด ตาม หลัง ก่อน ทุก บน
""",
    "ko": """
입니다 습니다 합니다 했다 하는 하고 하지만 그리고 그러나 또는 때문에 대한 위해 통해 같은
다른 모든 어떤 우리 당신 그들 저희 있는 있다 없다 되다 이다 아니다 에서 으로 부터 까지
에게 께서 의 를 을 는 은 이 가 와 과 도 만 로 에
""",
}

LANG_STOPLISTS = {
    lang: frozenset(w.lower() for w in words.split()) for lang, words in LANG_STOPLISTS.items()
}
NOSPACE_STOPLISTS = {
    lang: frozenset(words.split()) for lang, words in NOSPACE_STOPLISTS.items()
}

# merged defaults (reference external.py:124-131 semantics)
MERGED_STOPLIST = frozenset().union(*LANG_STOPLISTS.values())

# characters of scripts written without word spaces (han, kana, hangul,
# thai + compatibility blocks): paragraphs dominated by these use the
# coverage density instead of the token density
NOSPACE_CHAR_RE = re.compile(
    r"[฀-๿ᄀ-ᇿ぀-ヿ㄰-㆏"
    r"㐀-䶿一-鿿가-힯豈-﫿]"
)


def _compile_coverage_re(words: frozenset) -> re.Pattern:
    "Alternation regex over stopwords, longest-first so coverage is greedy."
    ordered = sorted(words, key=lambda w: (-len(w), w))
    return re.compile("|".join(re.escape(w) for w in ordered))


@lru_cache(maxsize=None)
def nospace_coverage_re(lang: str = "") -> re.Pattern:
    "Coverage regex for one no-space language, or all of them merged ('')."
    if lang:
        return _compile_coverage_re(NOSPACE_STOPLISTS[lang])
    return _compile_coverage_re(frozenset().union(*NOSPACE_STOPLISTS.values()))
