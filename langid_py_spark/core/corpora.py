"""Deterministic synthetic per-language corpora (FIXTURES.md F5).

The reference model (saffsd/langid.py's embedded 97-language blob) is
unavailable in this sandbox (SURVEY.md §0), so we train a fallback model
with IDENTICAL shape and semantics (byte 1-4-gram features, Aho-Corasick
DFA tokenizer, multinomial-NB log matmul) on these corpora. Everything is
seeded — the same call always yields byte-identical documents, so the
trained model, golden labels, and all tests are reproducible.

Word lists are small sets of common words per language (public knowledge);
non-Latin scripts get real high-frequency words too, which makes their
byte n-grams extremely separable (distinct UTF-8 lead bytes).
"""

from __future__ import annotations

import numpy as np

# ~40 high-frequency words per language. Order matters (deterministic).
WORDS: dict[str, list[str]] = {
    "en": """the of and to in is was for that it with as his on be at by had
    this not are but from or have an they which one you were all her she
    there would their we him been has when who will no more if out""".split(),
    "de": """der die und in den von zu das mit sich des auf für ist im dem
    nicht ein eine als auch es an werden aus er hat dass sie nach wird bei
    einer um am sind noch wie einem über einen so zum war haben nur""".split(),
    "fr": """de la le et les des en un du une que est pour qui dans a par
    plus pas au sur ne se ce il sont la comme mais avec tout nous sa son
    ses ou ils aux cette ces dont leur elle entre deux avait""".split(),
    "es": """de la que el en y a los del se las por un para con no una su
    al lo como más pero sus le ya o este sí porque esta entre cuando muy
    sin sobre también me hasta hay donde quien desde todo nos""".split(),
    "it": """di e il la che in a per è un sono non con si da come io questo
    ma le dei lui anche alla lei nel della suo ha più o sua mi degli se ci
    molto tutto loro essere fatto qui era sempre""".split(),
    "pt": """de a o que e do da em um para é com não uma os no se na por
    mais as dos como mas foi ao ele das tem à seu sua ou ser quando muito
    há nos já está eu também só pelo pela até isso""".split(),
    "nl": """de het een van en in is dat op te zijn met voor niet aan er om
    ook als dan maar bij nog uit naar door over zij heeft hij haar naar was
    worden wordt deze kunnen geen werd tot meer dit al zal""".split(),
    "sv": """och i att det som en på är av för med till den har de inte om
    ett han men var jag sig från vi så kan man när år under också efter
    eller nu sin där vid mot ska skulle kommer vad""".split(),
    "pl": """w i z na do nie że to się jest jak po co tak za od ma być przez
    tylko już o ale czy przy które który była został może przed bardzo
    jego jej ich tym tego gdy nas dla lat przez""".split(),
    "tr": """bir ve bu da ne için ile olarak daha çok en gibi kadar sonra
    ama var olan ben o kendi her iki diye ancak yıl göre şey bunun onun
    büyük yeni ilk zaman аrasında üzere olduğu türk eden""".split(),
    "ru": """и в не на я что он с как это был она так его но к по все она
    они мы за из у же от то для о при бы мне было этот один еще нет том
    только себя свою были когда уже если или ни""".split(),
    "uk": """і в не на що з до як це був вона так його але по всі за із у
    же від то для про при б мені було цей один ще немає тому тільки себе
    свою були коли вже якщо або ні та він ми""".split(),
    "ar": """في من على أن إلى عن التي الذي هذا هذه ما مع كان لم لا أو ثم قد
    كل بعد بين حيث عند غير حتى إذا كما لها له منذ وهو وهي فيه عليه الى ان
    ولا وما هناك ذلك تلك""".split(),
    "he": """של את על לא זה עם הוא היא אני אבל גם כי מה יש אם רק או שלו שלה
    כמו עוד אחד כך בין אחרי לפני שם מאוד היה הייתה להיות אנחנו אתם הם כאשר
    אשר בגלל למה איך מתי""".split(),
    "hi": """के में की है और से का को पर यह कि नहीं एक था वह हैं ने भी तो हो
    इस कर या अपने जो ही गया कुछ लिए हुए साथ करने वाले बाद तक रहा कहा दिया
    सकता उनके किया जा रही""".split(),
    "zh": """的 了 在 是 我 有 和 就 不 人 都 一 一个 上 也 很 到 说 要 去 你
    会 着 没有 看 好 自己 这 那 他 她 我们 来 对 能 而 中 大 为 们 这个 时候
    可以 什么 因为 所以""".split(),
    "ja": """の に は を た が で て と し れ さ ある いる も する から な こと
    として い や など なっ ない この ため その あっ よう また もの という
    あり まで られ なる へ か だ これ によって により おり""".split(),
    "ko": """이 그 저 것 수 등 들 및 에서 그리고 하지만 또한 있다 없다 한다
    했다 된다 而 위해 대한 통해 따라 같은 많은 때문 경우 사람 우리 지금
    다시 모든 어떤 사이 문제 사회 세계 정부 결과 시간""".split(),
}

LANGS: list[str] = sorted(WORDS)  # stable class order for the model

_PUNCT = [".", ".", ".", "!", "?", ","]


def make_sentence(rng: np.random.RandomState, lang: str, n_words: int) -> str:
    words = WORDS[lang]
    idx = rng.randint(0, len(words), size=n_words)
    toks = [words[i] for i in idx]
    sep = "" if lang in ("zh", "ja") else " "
    sent = sep.join(toks)
    return sent[:1].upper() + sent[1:] + _PUNCT[rng.randint(0, len(_PUNCT))]


def make_doc(rng: np.random.RandomState, lang: str, n_sentences: int) -> str:
    return " ".join(
        make_sentence(rng, lang, int(rng.randint(4, 14))) for _ in range(n_sentences)
    )


def training_corpus(
    docs_per_lang: int = 300, sentences_per_doc: int = 6, seed: int = 42
) -> list[tuple[str, str]]:
    """Deterministic (lang, text) training pairs, grouped by LANGS order."""
    out: list[tuple[str, str]] = []
    for li, lang in enumerate(LANGS):
        rng = np.random.RandomState(seed + 1000 * li)
        for _ in range(docs_per_lang):
            out.append((lang, make_doc(rng, lang, sentences_per_doc)))
    return out


def make_crawl_doc(rng: np.random.RandomState) -> str:
    """Deterministic crawl-junk document — the NEGATIVE class for the
    quality classifier (r06, de-circularizing VERDICT r05 item 6: the
    label used to be lang=='en', i.e. the langid model's own signal;
    the CCNet/GPT-3 recipe's real contrast is reference-corpus prose vs
    raw-crawl junk). Five junk flavors seen in real crawls, chosen so
    each trips a DIFFERENT classifier feature rather than one obvious
    tell: random-unicode soup (no word structure), digit/symbol dumps
    (digit_frac), navigation chrome (short-token pipes), unbroken
    identifier runs (mean_word_len), and repeated-line boilerplate
    walls (line_density)."""
    flavor = int(rng.randint(5))
    if flavor == 0:  # random unicode soup, few spaces
        n = int(rng.randint(120, 400))
        chars = [chr(int(c)) for c in rng.randint(33, 1200, size=n)]
        for j in range(0, n, int(rng.randint(25, 60))):
            chars[j] = " "
        return "".join(chars)
    if flavor == 1:  # digit / symbol dump
        toks = []
        for _ in range(int(rng.randint(25, 70))):
            kind = int(rng.randint(3))
            if kind == 0:
                toks.append(str(int(rng.randint(0, 10**9))))
            elif kind == 1:
                toks.append(
                    "".join(
                        "+-*/%$#@&|<>=~^"[int(c)] for c in rng.randint(0, 15, 4)
                    )
                )
            else:
                toks.append(f"{int(rng.randint(0,999))}.{int(rng.randint(0,99))}")
        return " ".join(toks)
    if flavor == 2:  # navigation chrome
        menu = ["Home", "Login", "FAQ", "RSS", "Next", "Prev", "Top", "Map",
                "EN", "DE", "2024", "©", ">>", "...", "Sitemap", "Cart"]
        return " | ".join(
            menu[int(i)] for i in rng.randint(0, len(menu), int(rng.randint(20, 60)))
        )
    if flavor == 3:  # unbroken identifier / hash runs
        toks = []
        for _ in range(int(rng.randint(3, 9))):
            ln = int(rng.randint(40, 120))
            toks.append(
                "".join(
                    "abcdef0123456789_-"[int(c)]
                    for c in rng.randint(0, 18, ln)
                )
            )
        return " ".join(toks)
    # flavor 4: boilerplate wall — one short line repeated many times
    line = " ".join(
        "cookie consent policy terms privacy accept".split()[int(i)]
        for i in rng.randint(0, 6, int(rng.randint(3, 6)))
    )
    return "\n".join([line] * int(rng.randint(8, 25)))
