"""Trained language identification (fasttext lid.176 role).

Role parity with the reference's fasttext language ID (reference:
rapid_doc/model/fast_langdetect/infer.py:24-30 — lid.176 over raw text).
No egress exists to fetch lid.176, so this trains the classic
compressed-langid architecture locally: a multinomial naive-Bayes over
HASHED CHARACTER N-GRAMS (2-/3-grams into 2^15 buckets), fit at first use
on the embedded seed corpora below (~0.5-1KB of representative running
text per language, written for this purpose). Within-script
discrimination is the hard part script ranges cannot do (utils/lang.py
handles script gating); the model is therefore trained per script group:
Latin (32 languages), Cyrillic (8), Arabic (3), Devanagari (3) — 46
languages plus the script-range singletons (ch/japan/korean/th/el/ta/
te/ka) resolved upstream.

The model builds in <50ms and weighs ~3MB in RAM; nothing ships on disk.
"""
from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

N_BUCKETS = 1 << 15

# Seed corpora: running text fragments (newspaper/encyclopedia register)
# carrying each language's characteristic function words, orthography and
# diacritics. They are training data, not quotations of any source.
CORPORA: dict[str, str] = {
    # ------------------------------------------------------------ latin
    "en": (
        "The committee published its annual report on the state of the "
        "economy and the measures that the government should take. Many "
        "of the people who attended the meeting were not convinced by "
        "the arguments, and they asked for further information about the "
        "costs and the benefits of the proposed changes. This is one of "
        "the most important questions of our time."
    ),
    "fr": (
        "Le comité a publié son rapport annuel sur l'état de l'économie "
        "et les mesures que le gouvernement devrait prendre. Beaucoup de "
        "personnes présentes à la réunion n'étaient pas convaincues par "
        "les arguments et elles ont demandé des informations "
        "supplémentaires sur les coûts et les bénéfices des changements "
        "proposés. C'est une des questions les plus importantes de notre "
        "époque."
    ),
    "de": (
        "Der Ausschuss veröffentlichte seinen Jahresbericht über die "
        "Lage der Wirtschaft und die Maßnahmen, die die Regierung "
        "ergreifen sollte. Viele der Anwesenden waren von den Argumenten "
        "nicht überzeugt und baten um weitere Informationen über die "
        "Kosten und den Nutzen der vorgeschlagenen Änderungen. Das ist "
        "eine der wichtigsten Fragen unserer Zeit."
    ),
    "es": (
        "El comité publicó su informe anual sobre el estado de la "
        "economía y las medidas que el gobierno debería tomar. Muchas de "
        "las personas que asistieron a la reunión no quedaron "
        "convencidas por los argumentos y pidieron más información sobre "
        "los costos y los beneficios de los cambios propuestos. Es una "
        "de las cuestiones más importantes de nuestro tiempo."
    ),
    "it": (
        "Il comitato ha pubblicato la sua relazione annuale sullo stato "
        "dell'economia e sulle misure che il governo dovrebbe adottare. "
        "Molte delle persone che hanno partecipato alla riunione non "
        "erano convinte dagli argomenti e hanno chiesto ulteriori "
        "informazioni sui costi e sui benefici dei cambiamenti proposti. "
        "È una delle questioni più importanti del nostro tempo."
    ),
    "pt": (
        "O comitê publicou o seu relatório anual sobre o estado da "
        "economia e as medidas que o governo deveria tomar. Muitas das "
        "pessoas que participaram da reunião não ficaram convencidas "
        "pelos argumentos e pediram mais informações sobre os custos e "
        "os benefícios das mudanças propostas. É uma das questões mais "
        "importantes do nosso tempo."
    ),
    "nl": (
        "De commissie publiceerde haar jaarverslag over de toestand van "
        "de economie en de maatregelen die de regering zou moeten nemen. "
        "Veel van de aanwezigen waren niet overtuigd door de argumenten "
        "en zij vroegen om meer informatie over de kosten en de baten "
        "van de voorgestelde veranderingen. Dit is een van de "
        "belangrijkste vragen van onze tijd."
    ),
    "pl": (
        "Komisja opublikowała swoje roczne sprawozdanie o stanie "
        "gospodarki oraz o środkach, które rząd powinien podjąć. Wielu "
        "uczestników spotkania nie było przekonanych argumentami i "
        "poprosiło o dodatkowe informacje na temat kosztów i korzyści "
        "proponowanych zmian. To jedno z najważniejszych pytań naszych "
        "czasów."
    ),
    "cs": (
        "Výbor zveřejnil svou výroční zprávu o stavu hospodářství a o "
        "opatřeních, která by vláda měla přijmout. Mnozí z přítomných "
        "nebyli argumenty přesvědčeni a požádali o další informace o "
        "nákladech a přínosech navrhovaných změn. Je to jedna z "
        "nejdůležitějších otázek naší doby."
    ),
    "sk": (
        "Výbor zverejnil svoju výročnú správu o stave hospodárstva a o "
        "opatreniach, ktoré by vláda mala prijať. Mnohí z prítomných "
        "neboli presvedčení argumentmi a požiadali o ďalšie informácie o "
        "nákladoch a prínosoch navrhovaných zmien. Je to jedna z "
        "najdôležitejších otázok našej doby."
    ),
    "sv": (
        "Kommittén publicerade sin årliga rapport om ekonomins tillstånd "
        "och de åtgärder som regeringen borde vidta. Många av dem som "
        "deltog i mötet var inte övertygade av argumenten och de bad om "
        "ytterligare information om kostnaderna och fördelarna med de "
        "föreslagna förändringarna. Detta är en av vår tids viktigaste "
        "frågor."
    ),
    "da": (
        "Udvalget offentliggjorde sin årlige rapport om økonomiens "
        "tilstand og de foranstaltninger, som regeringen burde træffe. "
        "Mange af deltagerne i mødet var ikke overbevist af "
        "argumenterne, og de bad om yderligere oplysninger om "
        "omkostningerne og fordelene ved de foreslåede ændringer. Det er "
        "et af vor tids vigtigste spørgsmål."
    ),
    "no": (
        "Utvalget offentliggjorde sin årlige rapport om tilstanden i "
        "økonomien og de tiltakene som regjeringen burde iverksette. "
        "Mange av dem som deltok på møtet var ikke overbevist av "
        "argumentene, og de ba om ytterligere informasjon om kostnadene "
        "og fordelene ved de foreslåtte endringene. Dette er et av vår "
        "tids viktigste spørsmål."
    ),
    "fi": (
        "Komitea julkaisi vuosikertomuksensa talouden tilasta ja "
        "toimenpiteistä, joihin hallituksen pitäisi ryhtyä. Monet "
        "kokoukseen osallistuneista eivät olleet vakuuttuneita "
        "perusteluista, ja he pyysivät lisätietoja ehdotettujen "
        "muutosten kustannuksista ja hyödyistä. Tämä on yksi aikamme "
        "tärkeimmistä kysymyksistä."
    ),
    "hu": (
        "A bizottság közzétette éves jelentését a gazdaság helyzetéről "
        "és azokról az intézkedésekről, amelyeket a kormánynak meg "
        "kellene tennie. Az ülésen részt vevők közül sokan nem voltak "
        "meggyőződve az érvekről, és további tájékoztatást kértek a "
        "javasolt változtatások költségeiről és előnyeiről. Ez korunk "
        "egyik legfontosabb kérdése."
    ),
    "ro": (
        "Comitetul a publicat raportul său anual privind starea "
        "economiei și măsurile pe care guvernul ar trebui să le ia. "
        "Mulți dintre cei care au participat la ședință nu au fost "
        "convinși de argumente și au cerut informații suplimentare "
        "despre costurile și beneficiile schimbărilor propuse. Este una "
        "dintre cele mai importante întrebări ale timpului nostru."
    ),
    "tr": (
        "Komite, ekonominin durumu ve hükümetin alması gereken önlemler "
        "hakkındaki yıllık raporunu yayımladı. Toplantıya katılanların "
        "çoğu ileri sürülen gerekçelere ikna olmadı ve önerilen "
        "değişikliklerin maliyetleri ile faydaları hakkında ek bilgi "
        "istedi. Bu, çağımızın en önemli sorularından biridir."
    ),
    "vi": (
        "Ủy ban đã công bố báo cáo thường niên về tình hình kinh tế và "
        "những biện pháp mà chính phủ nên thực hiện. Nhiều người tham "
        "dự cuộc họp không bị thuyết phục bởi các lập luận và họ đã yêu "
        "cầu thêm thông tin về chi phí và lợi ích của những thay đổi "
        "được đề xuất. Đây là một trong những câu hỏi quan trọng nhất "
        "của thời đại chúng ta."
    ),
    "id": (
        "Komite menerbitkan laporan tahunannya tentang keadaan ekonomi "
        "dan langkah-langkah yang seharusnya diambil oleh pemerintah. "
        "Banyak orang yang menghadiri pertemuan itu tidak yakin dengan "
        "argumen tersebut dan mereka meminta informasi lebih lanjut "
        "tentang biaya dan manfaat dari perubahan yang diusulkan. Ini "
        "adalah salah satu pertanyaan terpenting di zaman kita."
    ),
    "hr": (
        "Odbor je objavio svoje godišnje izvješće o stanju gospodarstva "
        "i mjerama koje bi vlada trebala poduzeti. Mnogi od nazočnih "
        "nisu bili uvjereni argumentima te su zatražili dodatne "
        "informacije o troškovima i koristima predloženih promjena. To "
        "je jedno od najvažnijih pitanja našega doba."
    ),
    "et": (
        "Komisjon avaldas oma aastaaruande majanduse olukorra ja "
        "meetmete kohta, mida valitsus peaks võtma. Paljud koosolekul "
        "osalejad ei olnud argumentides veendunud ning nad palusid "
        "lisateavet kavandatavate muudatuste kulude ja kasu kohta. See "
        "on meie aja üks tähtsamaid küsimusi."
    ),
    # --------------------------------------------------------- cyrillic
    "ru": (
        "Комитет опубликовал свой ежегодный доклад о состоянии "
        "экономики и о мерах, которые правительству следует принять. "
        "Многие из присутствовавших на заседании не были убеждены "
        "доводами и попросили дополнительную информацию о затратах и "
        "выгодах предлагаемых изменений. Это один из важнейших вопросов "
        "нашего времени."
    ),
    "uk": (
        "Комітет оприлюднив свій щорічний звіт про стан економіки та "
        "про заходи, яких уряд повинен вжити. Багато з присутніх на "
        "засіданні не були переконані аргументами і попросили "
        "додаткову інформацію про витрати та вигоди запропонованих "
        "змін. Це одне з найважливіших питань нашого часу."
    ),
    "bg": (
        "Комитетът публикува годишния си доклад за състоянието на "
        "икономиката и за мерките, които правителството трябва да "
        "предприеме. Мнозина от присъстващите на заседанието не бяха "
        "убедени от аргументите и поискаха допълнителна информация за "
        "разходите и ползите от предложените промени. Това е един от "
        "най-важните въпроси на нашето време."
    ),
    "sr": (
        "Одбор је објавио свој годишњи извештај о стању привреде и о "
        "мерама које би влада требало да предузме. Многи од присутних "
        "на седници нису били уверени аргументима и затражили су "
        "додатне информације о трошковима и користима предложених "
        "промена. То је једно од најважнијих питања нашег доба."
    ),
    "ca": (
        "El comitè va publicar el seu informe anual sobre l'estat de "
        "l'economia i les mesures que el govern hauria de prendre. "
        "Moltes de les persones que van assistir a la reunió no van "
        "quedar convençudes pels arguments i van demanar més informació "
        "sobre els costos i els beneficis dels canvis proposats. És una "
        "de les qüestions més importants del nostre temps."
    ),
    "af": (
        "Die komitee het sy jaarverslag oor die toestand van die "
        "ekonomie gepubliseer en oor die maatreëls wat die regering "
        "behoort te neem. Baie van die mense wat die vergadering "
        "bygewoon het, was nie deur die argumente oortuig nie en het "
        "verdere inligting gevra oor die koste en die voordele van die "
        "voorgestelde veranderinge. Dit is een van die belangrikste "
        "vrae van ons tyd."
    ),
    "ms": (
        "Jawatankuasa itu menerbitkan laporan tahunannya mengenai "
        "keadaan ekonomi dan langkah-langkah yang patut diambil oleh "
        "kerajaan. Ramai yang hadir dalam mesyuarat itu tidak yakin "
        "dengan hujah-hujah tersebut dan meminta maklumat lanjut "
        "mengenai kos dan faedah perubahan yang dicadangkan. Ini ialah "
        "salah satu persoalan terpenting zaman kita."
    ),
    "tl": (
        "Inilathala ng komite ang taunang ulat nito tungkol sa "
        "kalagayan ng ekonomiya at sa mga hakbang na dapat gawin ng "
        "pamahalaan. Marami sa mga dumalo sa pulong ang hindi kumbinsido "
        "sa mga argumento at humingi ng karagdagang impormasyon tungkol "
        "sa gastos at benepisyo ng mga iminungkahing pagbabago. Isa ito "
        "sa pinakamahahalagang tanong ng ating panahon."
    ),
    "sw": (
        "Kamati ilichapisha ripoti yake ya mwaka kuhusu hali ya uchumi "
        "na hatua ambazo serikali inapaswa kuchukua. Wengi wa watu "
        "waliohudhuria mkutano hawakushawishika na hoja hizo na waliomba "
        "taarifa zaidi kuhusu gharama na faida za mabadiliko "
        "yaliyopendekezwa. Hili ni mojawapo ya maswali muhimu zaidi ya "
        "wakati wetu."
    ),
    "sl": (
        "Odbor je objavil svoje letno poročilo o stanju gospodarstva in "
        "o ukrepih, ki bi jih morala sprejeti vlada. Mnogi od navzočih "
        "na seji niso bili prepričani z argumenti in so zahtevali "
        "dodatne informacije o stroških in koristih predlaganih "
        "sprememb. To je eno najpomembnejših vprašanj našega časa."
    ),
    "lt": (
        "Komitetas paskelbė savo metinę ataskaitą apie ekonomikos "
        "būklę ir priemones, kurių vyriausybė turėtų imtis. Daugelis "
        "posėdyje dalyvavusių žmonių nebuvo įtikinti argumentais ir "
        "paprašė daugiau informacijos apie siūlomų pakeitimų išlaidas "
        "ir naudą. Tai vienas svarbiausių mūsų laikų klausimų."
    ),
    "lv": (
        "Komiteja publicēja savu gada ziņojumu par ekonomikas stāvokli "
        "un pasākumiem, kas valdībai būtu jāveic. Daudzi sanāksmes "
        "dalībnieki nebija pārliecināti ar argumentiem un lūdza papildu "
        "informāciju par ierosināto izmaiņu izmaksām un ieguvumiem. "
        "Tas ir viens no mūsu laika svarīgākajiem jautājumiem."
    ),
    "is": (
        "Nefndin birti ársskýrslu sína um stöðu efnahagsmála og þær "
        "aðgerðir sem ríkisstjórnin ætti að grípa til. Margir þeirra "
        "sem sóttu fundinn voru ekki sannfærðir af rökunum og óskuðu "
        "eftir frekari upplýsingum um kostnað og ávinning af "
        "fyrirhuguðum breytingum. Þetta er ein mikilvægasta spurning "
        "okkar tíma."
    ),
    "sq": (
        "Komiteti publikoi raportin e tij vjetor për gjendjen e "
        "ekonomisë dhe për masat që qeveria duhet të marrë. Shumë nga "
        "të pranishmit në mbledhje nuk u bindën nga argumentet dhe "
        "kërkuan informacione të mëtejshme për kostot dhe përfitimet e "
        "ndryshimeve të propozuara. Kjo është një nga çështjet më të "
        "rëndësishme të kohës sonë."
    ),
    "az": (
        "Komitə iqtisadiyyatın vəziyyəti və hökumətin görməli olduğu "
        "tədbirlər barədə illik hesabatını dərc etdi. İclasda iştirak "
        "edənlərin çoxu arqumentlərə inanmadı və təklif olunan "
        "dəyişikliklərin xərcləri və faydaları barədə əlavə məlumat "
        "istədi. Bu, dövrümüzün ən vacib məsələlərindən biridir."
    ),
    # --------------------------------------------------------- cyrillic+
    "mk": (
        "Комитетот го објави својот годишен извештај за состојбата на "
        "економијата и за мерките што владата треба да ги преземе. "
        "Мнозина од присутните на седницата не беа убедени од "
        "аргументите и побараа дополнителни информации за трошоците и "
        "придобивките од предложените промени. Тоа е едно од "
        "најважните прашања на нашето време."
    ),
    "be": (
        "Камітэт апублікаваў сваю штогадовую справаздачу пра стан "
        "эканомікі і пра меры, якія ўрад павінен прыняць. Многія з "
        "прысутных на пасяджэнні не былі перакананыя аргументамі і "
        "папрасілі дадатковую інфармацыю пра выдаткі і выгады "
        "прапанаваных зменаў. Гэта адно з найважнейшых пытанняў "
        "нашага часу."
    ),
    "kk": (
        "Комитет экономиканың жағдайы туралы және үкімет қабылдауға "
        "тиіс шаралар туралы жылдық есебін жариялады. Жиналысқа "
        "қатысқандардың көбі дәлелдерге сенбеді және ұсынылған "
        "өзгерістердің шығындары мен пайдасы туралы қосымша ақпарат "
        "сұрады. Бұл біздің заманымыздың ең маңызды мәселелерінің "
        "бірі."
    ),
    "mn": (
        "Хороо эдийн засгийн байдал болон засгийн газар авах ёстой "
        "арга хэмжээний талаарх жилийн тайлангаа нийтэллээ. Хуралд "
        "оролцсон олон хүн уг үндэслэлд итгээгүй бөгөөд санал болгосон "
        "өөрчлөлтийн зардал ба ашиг тусын талаар нэмэлт мэдээлэл "
        "хүссэн. Энэ бол бидний үеийн хамгийн чухал асуудлын нэг "
        "юм."
    ),
    # ----------------------------------------------------------- arabic
    "ar": (
        "نشرت اللجنة تقريرها السنوي عن حالة الاقتصاد وعن التدابير التي "
        "ينبغي للحكومة أن تتخذها. لم يقتنع كثير من الحاضرين في الاجتماع "
        "بالحجج المقدمة وطلبوا مزيدا من المعلومات عن تكاليف التغييرات "
        "المقترحة وفوائدها. وهذه واحدة من أهم قضايا عصرنا."
    ),
    "fa": (
        "کمیته گزارش سالانه خود را درباره وضعیت اقتصاد و اقداماتی که "
        "دولت باید انجام دهد منتشر کرد. بسیاری از حاضران در جلسه با "
        "استدلال‌ها قانع نشدند و اطلاعات بیشتری درباره هزینه‌ها و "
        "مزایای تغییرات پیشنهادی خواستند. این یکی از مهم‌ترین "
        "مسائل روزگار ماست."
    ),
    "ur": (
        "کمیٹی نے معیشت کی حالت اور ان اقدامات کے بارے میں اپنی سالانہ "
        "رپورٹ شائع کی جو حکومت کو کرنے چاہئیں۔ اجلاس میں موجود بہت سے "
        "لوگ دلائل سے مطمئن نہیں ہوئے اور انہوں نے تجویز کردہ تبدیلیوں "
        "کے اخراجات اور فوائد کے بارے میں مزید معلومات مانگیں۔ یہ "
        "ہمارے دور کے اہم ترین سوالوں میں سے ایک ہے۔"
    ),
    # ------------------------------------------------------- devanagari
    "hi": (
        "समिति ने अर्थव्यवस्था की स्थिति और उन उपायों के बारे में अपनी "
        "वार्षिक रिपोर्ट प्रकाशित की जो सरकार को करने चाहिए। बैठक में "
        "उपस्थित कई लोग तर्कों से सहमत नहीं थे और उन्होंने प्रस्तावित "
        "परिवर्तनों की लागत और लाभ के बारे में और जानकारी मांगी। यह "
        "हमारे समय के सबसे महत्वपूर्ण प्रश्नों में से एक है।"
    ),
    "mr": (
        "समितीने अर्थव्यवस्थेच्या स्थितीबाबत आणि सरकारने कोणते उपाय "
        "करायला हवेत याबाबत आपला वार्षिक अहवाल प्रसिद्ध केला. बैठकीत "
        "उपस्थित असलेल्या अनेकांना युक्तिवाद पटले नाहीत आणि त्यांनी "
        "प्रस्तावित बदलांच्या खर्चाची व फायद्यांची अधिक माहिती "
        "मागितली. हा आपल्या काळातील सर्वात महत्त्वाच्या प्रश्नांपैकी "
        "एक आहे."
    ),
    "ne": (
        "समितिले अर्थतन्त्रको अवस्था र सरकारले चाल्नुपर्ने कदमहरूका "
        "बारेमा आफ्नो वार्षिक प्रतिवेदन प्रकाशित गर्यो। बैठकमा "
        "उपस्थित धेरै मानिसहरू तर्कहरूबाट विश्वस्त भएनन् र उनीहरूले "
        "प्रस्तावित परिवर्तनहरूको लागत र लाभबारे थप जानकारी मागे। यो "
        "हाम्रो समयको सबैभन्दा महत्त्वपूर्ण प्रश्नहरूमध्ये एक हो।"
    ),
}

LATIN_LANGS = [
    "en", "fr", "de", "es", "it", "pt", "nl", "pl", "cs", "sk", "sv",
    "da", "no", "fi", "hu", "ro", "tr", "vi", "id", "hr", "et",
    "ca", "af", "ms", "tl", "sw", "sl", "lt", "lv", "is", "sq", "az",
]
CYRILLIC_LANGS = ["ru", "uk", "bg", "sr", "mk", "be", "kk", "mn"]
ARABIC_LANGS = ["ar", "fa", "ur"]
DEVANAGARI_LANGS = ["hi", "mr", "ne"]


def _ngrams(text: str):
    # crc32, not builtin hash(): str hashing is salted per process and
    # would make the model nondeterministic across runs
    from zlib import crc32

    t = f" {' '.join(text.lower().split())} "
    for n in (2, 3):
        for i in range(len(t) - n + 1):
            yield crc32(t[i : i + n].encode("utf-8", "ignore")) % N_BUCKETS


def _fit(langs: list[str]) -> tuple[np.ndarray, list[str]]:
    """Multinomial NB log-likelihood matrix (n_langs, N_BUCKETS) f16."""
    mat = np.ones((len(langs), N_BUCKETS), np.float64)  # add-one smoothing
    for i, lang in enumerate(langs):
        for b in _ngrams(CORPORA[lang]):
            mat[i, b] += 1.0
    mat /= mat.sum(axis=1, keepdims=True)
    return np.log(mat).astype(np.float16), langs


@lru_cache(maxsize=8)
def _model(script: str):
    if script == "cyrillic":
        return _fit(CYRILLIC_LANGS)
    if script == "arabic":
        return _fit(ARABIC_LANGS)
    if script == "devanagari":
        return _fit(DEVANAGARI_LANGS)
    return _fit(LATIN_LANGS)


def classify(text: str, script: str = "latin") -> tuple[str, float]:
    """(language, margin) for text already gated to a script group.

    margin is the per-gram log-likelihood gap between the best and
    second-best language — calibrate thresholds on it (≥0.05 is a
    confident call on a sentence of running text)."""
    logp, langs = _model(script)
    grams = list(_ngrams(text[:4000]))
    if not grams:
        return langs[0], 0.0
    idx, counts = np.unique(np.asarray(grams), return_counts=True)
    scores = (logp[:, idx].astype(np.float32) * counts).sum(axis=1)
    order = np.argsort(scores)
    best, second = order[-1], order[-2]
    margin = float(scores[best] - scores[second]) / len(grams)
    return langs[best], margin
