"""Dev loop: fuzz a python Snowball port against the compiled reference.

Usage: python tools/snowball_fuzz.py <lang> [n_rounds]
lang in {Spanish, Italian, French, Dutch, Russian, KpDutch, ...}
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import lucene_ground_truth as gt

LANG_SETUP = {
    "Spanish": dict(
        alphabet="abcdefghijlmnopqrstuvxyzáéíóúüñ",
        stems=["cas", "habl", "com", "viv", "cant", "torment", "llegu",
               "logic", "nacional", "capac", "atac", "guij", "sigu",
               "ayu", "cuy", "huy", "constru", "relig", "penalti",
               "gener", "import", "real", "visit", "trabaj", "estudi"],
        sufs=["a", "o", "os", "as", "e", "es", "é", "ó", "í", "á",
              "amente", "mente", "idad", "idades", "iva", "ivo", "able",
              "ible", "ación", "aciones", "ador", "adora", "logía",
              "ución", "encia", "encias", "amiento", "imiento", "ista",
              "ismo", "oso", "ico", "anza", "aba", "ado", "ando",
              "iendo", "ar", "er", "ir", "aría", "aré", "eremos",
              "ieron", "iese", "ase", "áramos", "ábamos", "íamos",
              "yendo", "ya", "yeron", "yo", "uye", "uyen", "emos",
              "éis", "en", "me", "se", "la", "lo", "nos", "sela",
               "selos", "ándola", "iéndolo", "árselo"],
    ),
    "Italian": dict(
        alphabet="abcdefghilmnopqrstuvzàèìòùáéíóú",
        stems=["cas", "parl", "cant", "legg", "finisc", "mangi", "stud",
               "nazional", "logic", "amic", "bell", "grand", "lavor",
               "pens", "ultim", "qualc", "guid", "acqu", "pioggi",
               "famigli", "uom", "ragazz", "important"],
        sufs=["a", "o", "i", "e", "à", "è", "ì", "ò", "amente", "mente",
              "ità", "ivo", "iva", "abile", "ibile", "azione", "atore",
              "logia", "uzione", "enza", "amento", "imento", "ista",
              "ismo", "oso", "ico", "anza", "ava", "ato", "ando",
              "endo", "are", "ere", "ire", "erebbe", "irebbero",
              "assimo", "issero", "iamo", "iate", "ano", "ono", "ci",
              "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti",
              "vi", "sene", "gliela", "mela", "cela", "vela",
              "andoci", "endogli", "arla", "erlo", "irne", "ch", "gh"],
    ),
    "French": dict(
        alphabet="abcdefghijlmnopqrstuvxyzàâçèéêëîïôùûü",
        stems=["port", "march", "parl", "fin", "mang", "nation", "log",
               "continu", "import", "commenc", "étud", "chât", "franç",
               "jou", "cri", "pay", "env", "bataill", "travaill",
               "princ", "machin", "copi", "ennem", "beau", "joua", "ayu",
               "oui", "yeu", "aïeu", "quiou", "uy", "yay", "ouiy"],
        sufs=["e", "es", "é", "ée", "ées", "és", "èrent", "er", "era",
              "erait", "eraient", "erons", "eront", "ez", "iez",
              "ance", "ances", "ique", "iques", "isme", "ismes",
              "able", "ables", "iste", "istes", "eux", "atrice",
              "ation", "ations", "ateur", "logie", "logies", "usion",
              "ution", "ence", "ences", "ement", "ements", "ité",
              "ités", "if", "ive", "ifs", "ives", "eaux", "aux",
              "euse", "euses", "issement", "issements", "amment",
              "emment", "ment", "ments", "ie", "ir", "it", "issant",
              "issante", "is", "ira", "irait", "iront", "ons", "ont",
              "ant", "ante", "antes", "ants", "ais", "ait", "aient",
              "asse", "assent", "âmes", "âtes", "enn", "onn", "ett",
              "ell", "eill", "s", "x"],
    ),
    "Dutch": dict(
        alphabet="abcdefghijklmnopqrstuvwyzäëïöüáéíóú",
        stems=["lop", "werk", "lichamelijk", "opmerk", "gel", "baker",
               "hand", "kind", "groot", "klein", "huiz", "duid", "jarig",
               "koning", "landbouw", "water", "gemeen", "zoek", "vlieg",
               "typ", "bijzonder", "aanw", "bloe", "boe", "moe"],
        sufs=["", "e", "en", "ene", "s", "se", "heid", "heden", "end",
              "ing", "ig", "lijk", "baar", "bar", "ingen", "igen",
              "ende", "elijk", "den", "ten", "je", "tje", "aa", "ee",
              "oo", "uu", "aat", "eet", "oot", "uut", "y", "ij"],
    ),
    "Norwegian": dict(
        alphabet="abdefghijklmnoprstuvyæåø",
        stems=["arbeid", "bok", "hus", "venn", "vakker", "norsk", "kjær",
               "spill", "bygg", "lærer", "jent", "gutt", "havn", "trygg",
               "mulig", "viktig", "løs", "forsk", "lov", "het"],
        sufs=["", "a", "e", "ede", "ande", "ende", "ane", "ene",
              "hetene", "en", "heten", "ar", "er", "heter", "as", "es",
              "enes", "ens", "ets", "et", "het", "ast", "s", "erte",
              "ert", "leg", "eleg", "ig", "eig", "lig", "elig", "els",
              "lov", "elov", "slov", "hetslov", "dt", "vt", "ks", "ys"],
    ),
    "Danish": dict(
        alphabet="abdefghijklmnoprstuvyzæåø",
        stems=["arbejd", "bog", "hus", "ven", "smuk", "dansk", "kærlig",
               "spil", "byg", "lærer", "pige", "dreng", "havn", "tryg",
               "mulig", "vigtig", "løs", "forsk", "indtag", "hek"],
        sufs=["", "hed", "ethed", "ered", "e", "erede", "ende",
              "erende", "ene", "erne", "ere", "en", "heden", "eren",
              "er", "heder", "erer", "heds", "es", "endes", "enes",
              "ens", "ets", "et", "eret", "s", "igst", "lig", "elig",
              "els", "løst", "gd", "dt", "gt", "kt", "tt", "nn", "ss"],
    ),
    "Swedish": dict(
        alphabet="abdefghijklmnoprstuvyäåö",
        stems=["arbet", "bok", "hus", "vän", "vacker", "svensk", "kärlek",
               "spel", "bygg", "lärar", "flick", "pojk", "hamn", "trygg",
               "möjlig", "viktig", "lös", "forsk", "full", "het"],
        sufs=["", "a", "arna", "erna", "heterna", "orna", "ad", "e",
              "ade", "ande", "arne", "are", "aste", "en", "anden",
              "aren", "heten", "ern", "ar", "er", "heter", "or", "as",
              "arnas", "es", "ades", "ens", "hetens", "at", "andet",
              "het", "ast", "s", "lig", "ig", "els", "löst", "fullt",
              "dd", "gd", "nn", "dt", "gt", "kt", "tt"],
    ),
    "Portuguese": dict(
        alphabet="abcdefghijlmnopqrstuvxzáéíóúâêôãõç",
        stems=["cas", "fal", "com", "viv", "cant", "trabalh", "cheg",
               "logic", "nacional", "capac", "atac", "segu", "constru",
               "relig", "gener", "import", "real", "visit", "estud",
               "form", "grac", "informaç", "coraç", "decis"],
        sufs=["a", "o", "os", "as", "e", "es", "é", "ê", "ó", "í", "á",
              "amente", "mente", "idade", "idades", "iva", "ivo",
              "ável", "ível", "ação", "ações", "ador", "adora",
              "logia", "ução", "uções", "ência", "amento", "imento",
              "ista", "ismo", "oso", "ico", "eza", "ava", "ado",
              "ando", "endo", "indo", "ar", "er", "ir", "aria",
              "arei", "eremos", "aram", "isse", "asse", "áramos",
              "ávamos", "íamos", "eira", "eiras", "ções", "ão", "ã",
              "ões", "ou", "eu", "iu", "ci", "gue", "que", "ce"],
    ),
    "Finnish": dict(
        alphabet="abdeghijklmnoprstuvyäö",
        stems=["kaupung", "talo", "nopea", "kirj", "opiskelij", "suur",
               "pien", "vanh", "uus", "katu", "järv", "tyttö", "poik",
               "ihmis", "käs", "ves", "puhu", "sano", "elä", "juo",
               "syö", "tietokone", "yliopisto", "aatonaatto", "eläkk",
               "po", "joj", "oj", "ie", "taivaa"],
        sufs=["", "a", "ä", "n", "en", "in", "na", "nä", "ssa", "ssä",
              "sta", "stä", "lla", "llä", "lta", "ltä", "lle", "ksi",
              "tta", "ttä", "han", "hän", "hen", "hin", "hon", "hön",
              "seen", "siin", "den", "tten", "ine", "kin", "kaan",
              "kään", "ko", "kö", "pa", "pä", "sti", "si", "ni", "nsa",
              "nsä", "mme", "nne", "an", "än", "mpi", "mpa", "immi",
              "imma", "eja", "ejä", "mmä", "impä", "i", "j", "t", "it",
              "at", "ät", "et", "ut", "aa", "ee", "ii", "oo", "uu",
              "ää", "öö", "ie", "kse", "ksen"],
    ),
    "Hungarian": dict(
        alphabet="abcdefghijklmnoprstuvzáéíóöõúüû",
        stems=["ház", "asszony", "ember", "gyerek", "kert", "fall",
               "szekrény", "mall", "balett", "munk", "iskol", "tanár",
               "madzs", "épp", "öccs", "vissz", "hosszú", "könyv",
               "ablak", "utc", "magyar", "nagy", "dolgoz", "barát"],
        sufs=["", "ban", "ben", "ba", "be", "ra", "re", "nak", "nek",
              "val", "vel", "tól", "tõl", "ból", "bõl", "ról", "rõl",
              "nál", "nél", "hoz", "hez", "höz", "ig", "ért", "ul",
              "ül", "vá", "vé", "kor", "t", "at", "et", "ot", "öt",
              "n", "an", "en", "on", "ön", "képp", "képpen", "ként",
              "anként", "enként", "onként", "án", "én", "ánként",
              "stul", "stül", "astul", "estül", "ástul", "éstül",
              "á", "é", "k", "ak", "ek", "ok", "ök", "ák", "ék",
              "éi", "áéi", "ééi", "ké", "aké", "eké", "oké", "áké",
              "éké", "öké", "éé", "a", "ja", "d", "ad", "ed", "od",
              "öd", "ád", "éd", "e", "je", "nk", "unk", "ünk", "ánk",
              "énk", "uk", "juk", "ájuk", "ük", "jük", "éjük", "m",
              "am", "em", "om", "ám", "ém", "o", "id", "aid", "jaid",
              "eid", "jeid", "áid", "éid", "i", "ai", "jai", "ei",
              "jei", "ái", "itek", "eitek", "jeitek", "éitek", "ik",
              "aik", "jaik", "eik", "jeik", "áik", "éik", "ink",
              "aink", "jaink", "eink", "jeink", "áink", "éink",
              "aitok", "jaitok", "áitok", "im", "aim", "jaim", "eim",
              "jeim", "áim", "éim", "al", "el"],
    ),
    "Romanian": dict(
        alphabet="abcdefghijlmnoprstuvzâîăşţ",
        stems=["cas", "copil", "oraş", "lucr", "frumos", "român",
               "naţional", "studenţ", "profes", "cânt", "vorb", "citit",
               "abil", "staţ", "ab", "fet", "băiat", "munc", "iubit",
               "gândit", "istoric", "politic", "important", "deose"],
        sufs=["", "a", "e", "i", "ă", "ie", "ea", "ia", "ele", "ile",
              "iile", "ul", "ului", "aua", "iua", "aţia", "aţie", "iei",
              "atei", "ii", "elor", "ilor", "iilor", "ică", "ica",
              "abila", "ibila", "oasa", "ata", "ita", "anta", "ista",
              "uta", "iva", "ice", "isme", "iune", "iuni", "oase",
              "ate", "itate", "ite", "ante", "iste", "ute", "ive",
              "ici", "abili", "atori", "osi", "ati", "itati", "iti",
              "anti", "isti", "uti", "işti", "ivi", "ităi", "oşi",
              "ităţi", "abil", "ibil", "ism", "ator", "os", "at", "it",
              "ant", "ist", "ut", "iv", "icala", "ativa", "itiva",
              "aţiune", "iţiune", "atoare", "itoare", "ătoare",
              "icitate", "abilitate", "ibilitate", "ivitate", "icatori",
              "ători", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
              "âre", "se", "ase", "sese", "ise", "use", "âse", "eşte",
              "ăşte", "eze", "ai", "eai", "iai", "sei", "eşti", "ăşti",
              "ui", "ezi", "âi", "aşi", "seşi", "aseşi", "işi", "uşi",
              "aţi", "eaţi", "iaţi", "eţi", "iţi", "âţi", "arăţi",
              "serăţi", "am", "eam", "iam", "em", "asem", "im", "âm",
              "ăm", "arăm", "serăm", "au", "eau", "iau", "indu",
              "ându", "ez", "ească", "ară", "seră", "aseră", "iră",
              "ură", "âră", "ează"],
    ),
    "Turkish": dict(
        alphabet="abcçdefgğhıijklmnoöprsştuüvyz",
        stems=["ev", "kitap", "ağaç", "okul", "göz", "araba", "çocuk",
               "insan", "şehir", "gün", "yol", "el", "kapı", "deniz",
               "türk", "ankara", "çiçek", "dağ", "köy", "su", "baş",
               "kalem", "masa", "pencere", "ders", "öğrenci", "ad",
               "soyad", "kedi", "balık", "kuş", "arkadaş", "anne"],
        sufs=["", "lar", "ler", "ları", "leri", "da", "de", "ta", "te",
              "nda", "nde", "dan", "den", "tan", "ten", "ndan", "nden",
              "la", "le", "yla", "yle", "ca", "ce", "nca", "nce", "ki",
              "daki", "deki", "ndaki", "in", "un", "ün", "ın", "nin",
              "nun", "nün", "nın", "a", "e", "ya", "ye", "na", "ne",
              "i", "u", "ü", "ı", "yi", "yu", "yü", "yı", "ni", "nu",
              "nü", "nı", "si", "su", "sü", "sı", "m", "n", "miz",
              "niz", "muz", "nuz", "müz", "nüz", "mız", "nız", "im",
              "um", "üm", "ım", "yim", "yum", "yüm", "yım", "sin",
              "sun", "sün", "sın", "iz", "uz", "üz", "ız", "yiz",
              "yuz", "yüz", "yız", "siniz", "sunuz", "sünüz", "sınız",
              "dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır",
              "casına", "cesine", "di", "ti", "dik", "tik", "duk",
              "tuk", "dük", "tük", "dık", "tık", "dim", "tim", "dum",
              "tum", "düm", "tüm", "dım", "tım", "din", "tin", "dun",
              "tun", "dün", "tün", "dın", "tın", "du", "tu", "dü",
              "tü", "dı", "tı", "ydi", "yti", "ydı", "ytı", "ydu",
              "ydü", "sa", "se", "sak", "sek", "sam", "sem", "san",
              "sen", "ysa", "yse", "miş", "muş", "müş", "mış", "ymiş",
              "ymuş", "ymüş", "ymış", "ken", "yken", "ndekiler",
              "lerindeki", "larındaki", "sındaki", "indekilerden"],
    ),
    "Russian": dict(
        alphabet="абвгдежзиклмнопрстуфхцчшщъыьэюяё",
        stems=["книг", "говор", "красн", "работ", "человеч", "студентк",
               "бел", "сильн", "нов", "стар", "делат", "ходи", "больш",
               "перв", "важн", "密".replace("密", "глубок"), "высок"],
        sufs=["", "а", "ы", "и", "о", "е", "у", "ю", "я", "ой", "ого",
              "ому", "ыми", "ая", "яя", "ое", "ее", "ть", "ешь", "ет",
              "ем", "ете", "ут", "ают", "ил", "ила", "ило", "или",
              "вши", "вшись", "ся", "сь", "ость", "ости", "ейш",
              "ейше", "нн", "ь", "ий", "ый", "ов", "ев", "ами", "ях",
              "иями", "ями", "ением", "ение", "ируя", "ывая", "ав"],
    ),
}


def _table_setup(alphabet, stems, *tables):
    """Build a fuzz setup whose suffix pool is the among tables
    themselves (plus bare letters), for table-driven stemmers."""
    sufs = {""}
    for tab in tables:
        for s, _v in tab:
            if s:
                sufs.add(s)
    sufs.update(alphabet[:8])
    return dict(alphabet=alphabet, stems=stems, sufs=sorted(sufs))


def _misc_setups():
    from lucene_solr_spark.analysis import snowball_misc_tables as t

    return {
        "Catalan": _table_setup(
            "abcdefghijlmnopqrstuvxyzàáèéíïòóúü·",
            ["cas", "parl", "cant", "nacional", "log", "amig", "ic",
             "practic", "quiss", "gat", "taul", "barcelon", "catal",
             "treball", "pens", "form"],
            t.CA_A1, t.CA_A2, t.CA_A3, t.CA_A4),
        "Basque": _table_setup(
            "abdefghijklmnoprstuxz",
            ["etxe", "gizon", "eder", "lan", "buru", "herri", "zehar",
             "jok", "atseden", "mendi", "itsaso", "liburu", "eskol"],
            t.EU_A0, t.EU_A1, t.EU_A2),
        "Irish": _table_setup(
            "abcdefghilmnoprstuáéíóú'-",
            ["scoil", "gin", "grafaíoch", "pata", "arcach", "óide",
             "ceol", "amhr", "litr", "beal", "dún", "fear", "cos",
             "bhfear", "gcat", "tsol", "d'fhear", "n-éan", "mball"],
            t.GA_A0, t.GA_A1, t.GA_A2, t.GA_A3),
        "Armenian": _table_setup(
            "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ",
            ["գիրք", "տուն", "մարդ", "քաղաք", "սեր", "ջուր", "հայ",
             "լեռ", "ծառ", "գործ", "խոսք", "երգ"],
            t.HY_A0, t.HY_A1, t.HY_A2, t.HY_A3),
    }


def main():
    lang = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 8501
    if lang in ("Catalan", "Basque", "Irish", "Armenian"):
        LANG_SETUP.update(_misc_setups())
    setup = LANG_SETUP[lang]
    fn = {
        "Spanish": "snowball_es.spanish_stem",
        "Italian": "snowball_it.italian_stem",
        "French": "snowball_fr.french_stem",
        "Dutch": "snowball_nl.dutch_stem",
        "Russian": "snowball_ru.russian_stem",
        "Norwegian": "snowball_scand.norwegian_stem",
        "Danish": "snowball_scand.danish_stem",
        "Swedish": "snowball_scand.swedish_stem",
        "Portuguese": "snowball_pt.portuguese_stem",
        "Finnish": "snowball_fi.finnish_stem",
        "Hungarian": "snowball_hu.hungarian_stem",
        "Romanian": "snowball_ro.romanian_stem",
        "Turkish": "snowball_tr.turkish_stem",
        "Catalan": "snowball_misc.catalan_stem",
        "Basque": "snowball_misc.basque_stem",
        "Irish": "snowball_misc.irish_stem",
        "Armenian": "snowball_misc.armenian_stem",
    }[lang]
    mod_name, fn_name = fn.split(".")
    mod = __import__(f"lucene_solr_spark.analysis.{mod_name}",
                     fromlist=[fn_name])
    stem = getattr(mod, fn_name)

    assert gt.build()
    rng = random.Random(seed)
    words = []
    for _ in range(rounds * 8):
        r = rng.random()
        if r < 0.45:
            word = rng.choice(setup["stems"]) + rng.choice(setup["sufs"])
            if rng.random() < 0.35:
                word += rng.choice(setup["sufs"])
        elif r < 0.75:
            word = (rng.choice(setup["stems"])[:rng.randint(1, 4)]
                    + "".join(rng.choice(setup["alphabet"])
                              for _ in range(rng.randint(1, 6))))
        else:
            word = "".join(rng.choice(setup["alphabet"])
                           for _ in range(rng.randint(1, 10)))
        words.append(word)
    words = sorted(set(words))
    lines = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
    exp = gt.run_snowball(lines, lang)
    n_bad = 0
    for ln, ex in zip(lines, exp):
        toks = ln.split(" ")
        got = [stem(t) for t in toks]
        want = [t for (t, _pi, _s, _e) in ex]
        for tok, g, w in zip(toks, got, want):
            if g != w:
                n_bad += 1
                if n_bad <= 25:
                    print(f"DIFF {tok!r}: mine={g!r} java={w!r}")
    print(f"{lang}: {len(words)} words, {n_bad} mismatches")


if __name__ == "__main__":
    main()
