"""Language-ID routing over 46 languages (fasttext lid.176 role,
reference: rapid_doc/model/fast_langdetect/infer.py:24-30).

The sentences below are HELD OUT — none appear in the utils/langid.py
seed corpora; they exercise generalization of the hashed n-gram model,
not memorization. Non-Latin/non-Cyrillic scripts route through the
unicode-script gate in utils/lang.py and are included for end-to-end
coverage of detect_lang."""
from __future__ import annotations

import pytest

from rapiddoc_tpu.utils.lang import classify_language, detect_lang
from rapiddoc_tpu.utils.langid import classify

LATIN_SAMPLES = {
    "en": "Researchers found that the new method performs better than "
          "existing approaches when the data contains noise.",
    "fr": "Les chercheurs ont montré que la nouvelle méthode fonctionne "
          "mieux lorsque les données contiennent du bruit.",
    "de": "Die Forscher zeigten, dass das neue Verfahren besser "
          "funktioniert, wenn die Daten verrauscht sind.",
    "es": "Los investigadores demostraron que el nuevo método funciona "
          "mejor cuando los datos contienen ruido.",
    "it": "I ricercatori hanno dimostrato che il nuovo metodo funziona "
          "meglio quando i dati contengono rumore.",
    "pt": "Os pesquisadores demonstraram que o novo método funciona "
          "melhor quando os dados contêm ruído.",
    "nl": "De onderzoekers toonden aan dat de nieuwe methode beter werkt "
          "wanneer de gegevens ruis bevatten.",
    "pl": "Badacze wykazali, że nowa metoda działa lepiej, gdy dane "
          "zawierają szum pomiarowy.",
    "cs": "Výzkumníci prokázali, že nová metoda funguje lépe, když data "
          "obsahují šum měření.",
    "sv": "Forskarna visade att den nya metoden fungerar bättre när "
          "uppgifterna innehåller brus.",
    "da": "Forskerne viste, at den nye metode virker bedre, når dataene "
          "indeholder støj fra målingerne.",
    "fi": "Tutkijat osoittivat, että uusi menetelmä toimii paremmin, kun "
          "aineisto sisältää kohinaa.",
    "hu": "A kutatók kimutatták, hogy az új módszer jobban működik, ha "
          "az adatok zajt tartalmaznak.",
    "ro": "Cercetătorii au demonstrat că noua metodă funcționează mai "
          "bine atunci când datele conțin zgomot.",
    "tr": "Araştırmacılar, veriler gürültü içerdiğinde yeni yöntemin "
          "daha iyi çalıştığını gösterdi.",
    "vi": "Các nhà nghiên cứu đã chứng minh rằng phương pháp mới hoạt "
          "động tốt hơn khi dữ liệu có nhiễu.",
    "id": "Para peneliti menunjukkan bahwa metode baru bekerja lebih "
          "baik ketika data mengandung derau.",
    "ca": "Els investigadors van demostrar que el nou mètode funciona "
          "millor quan les dades contenen soroll.",
    "af": "Die navorsers het getoon dat die nuwe metode beter werk "
          "wanneer die data geraas bevat.",
    "sw": "Watafiti walionyesha kwamba mbinu mpya inafanya kazi vizuri "
          "zaidi wakati data ina kelele.",
    "tl": "Ipinakita ng mga mananaliksik na mas mahusay gumagana ang "
          "bagong pamamaraan kapag may ingay ang datos.",
    "sl": "Raziskovalci so pokazali, da nova metoda deluje bolje, kadar "
          "podatki vsebujejo šum meritev.",
    "lt": "Tyrėjai parodė, kad naujasis metodas veikia geriau, kai "
          "duomenyse yra triukšmo.",
    "lv": "Pētnieki parādīja, ka jaunā metode darbojas labāk, ja dati "
          "satur mērījumu troksni.",
    "is": "Rannsakendur sýndu að nýja aðferðin virkar betur þegar "
          "gögnin innihalda suð.",
    "sq": "Studiuesit treguan se metoda e re funksionon më mirë kur të "
          "dhënat përmbajnë zhurmë.",
    "az": "Tədqiqatçılar göstərdilər ki, məlumatlarda səs-küy olduqda "
          "yeni üsul daha yaxşı işləyir.",
}

CYRILLIC_SAMPLES = {
    "ru": "Исследователи показали, что новый метод работает лучше, "
          "когда данные содержат шум измерений.",
    "uk": "Дослідники показали, що новий метод працює краще, коли дані "
          "містять шум вимірювань.",
    "bg": "Изследователите показаха, че новият метод работи по-добре, "
          "когато данните съдържат шум.",
    "sr": "Истраживачи су показали да нови метод ради боље када подаци "
          "садрже шум мерења.",
    "mk": "Истражувачите покажаа дека новиот метод работи подобро кога "
          "податоците содржат шум.",
    "be": "Даследчыкі паказалі, што новы метад працуе лепш, калі "
          "дадзеныя ўтрымліваюць шум вымярэнняў.",
    "kk": "Зерттеушілер деректерде шу болған кезде жаңа әдістің "
          "жақсырақ жұмыс істейтінін көрсетті.",
    "mn": "Судлаачид өгөгдөлд шуугиан байгаа үед шинэ арга илүү сайн "
          "ажилладагийг харуулсан.",
}

REFINED_SCRIPT_SAMPLES = {
    "ar": "أظهر الباحثون أن الطريقة الجديدة تعمل بشكل أفضل عندما "
          "تحتوي البيانات على ضوضاء.",
    "fa": "پژوهشگران نشان دادند که روش جدید هنگامی که داده‌ها نویز "
          "دارند بهتر عمل می‌کند.",
    "ur": "محققین نے دکھایا کہ جب ڈیٹا میں شور ہوتا ہے تو نیا طریقہ "
          "بہتر کام کرتا ہے۔",
    "hi": "शोधकर्ताओं ने दिखाया कि जब डेटा में शोर होता है तो नई "
          "विधि बेहतर काम करती है।",
    "mr": "संशोधकांनी दाखवून दिले की डेटामध्ये गोंगाट असताना नवीन "
          "पद्धत अधिक चांगले काम करते.",
    "ne": "अनुसन्धानकर्ताहरूले देखाए कि डेटामा हल्ला हुँदा नयाँ "
          "विधिले राम्रोसँग काम गर्छ।",
}

SCRIPT_SAMPLES = {
    "ch": "研究人员发现，当数据包含噪声时，新方法的表现优于现有方法。",
    "japan": "研究者たちは、データにノイズが含まれる場合、新しい手法が"
             "より優れていることを示しました。",
    "korean": "연구자들은 데이터에 노이즈가 포함될 때 새로운 방법이 더 "
              "잘 작동한다는 것을 보여주었다.",
    "arabic": "أظهر الباحثون أن الطريقة الجديدة تعمل بشكل أفضل عندما "
              "تحتوي البيانات على ضوضاء.",
    "th": "นักวิจัยแสดงให้เห็นว่าวิธีการใหม่ทำงานได้ดีกว่าเมื่อข้อมูลมีสัญญาณรบกวน",
    "el": "Οι ερευνητές έδειξαν ότι η νέα μέθοδος λειτουργεί καλύτερα "
          "όταν τα δεδομένα περιέχουν θόρυβο.",
    "devanagari": "शोधकर्ताओं ने दिखाया कि जब डेटा में शोर होता है तो नई "
                  "विधि बेहतर काम करती है।",
}


@pytest.mark.parametrize("lang,text", sorted(LATIN_SAMPLES.items()))
def test_latin_routing(lang, text):
    assert detect_lang(text) == lang


@pytest.mark.parametrize("lang,text", sorted(CYRILLIC_SAMPLES.items()))
def test_cyrillic_routing(lang, text):
    assert detect_lang(text) == lang


@pytest.mark.parametrize("lang,text", sorted(SCRIPT_SAMPLES.items()))
def test_script_routing(lang, text):
    assert detect_lang(text) == lang


@pytest.mark.parametrize(
    "lang,text", sorted(REFINED_SCRIPT_SAMPLES.items())
)
def test_within_script_refinement(lang, text):
    """classify_language refines Arabic/Devanagari scripts to the ISO
    code (ar/fa/ur, hi/mr/ne); detect_lang keeps the OCR rec FAMILY
    (reference rapidocr lang keys are script-level for those)."""
    assert classify_language(text) == lang
    fam = detect_lang(text)
    assert fam in ("arabic", "devanagari")


def test_classifier_margin_is_confident_on_running_text():
    lang, margin = classify(LATIN_SAMPLES["de"], "latin")
    assert lang == "de" and margin >= 0.05


def test_short_or_empty_text_defaults():
    assert detect_lang("") == "ch"
    assert detect_lang("12345 *** !!!") == "ch"
